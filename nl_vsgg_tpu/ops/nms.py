"""TPU-friendly non-maximum suppression over padded, fixed-shape box sets.

Replaces the reference's 64-box-bitmask CUDA kernel
(fasterRCNN/lib/model/csrc/cuda/nms.cu, exposed as `_C.nms` via
fasterRCNN/lib/model/roi_layers/nms.py:3-5) and the numpy `all_nms`
(lib/track.py:13-40). Those kernels use the legacy +1-pixel area convention,
which we keep as the default.

Design: instead of dynamic keep-lists, we compute the full pairwise IoU matrix
once (a single fused VPU pass) and run the greedy suppression as a
`lax.fori_loop` over score rank updating a suppression mask — static shapes,
no host sync, O(N^2) memory which is trivial at AG scale (N <= a few hundred
per frame/class). Returns a boolean keep mask over the original order plus the
score-descending ranking, so callers can reproduce the reference's
"keep, in score order" output exactly.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .boxes import iou

NEG_INF = -1e30


@partial(jax.jit, static_argnames=("plus_one",))
def nms_mask(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float,
             valid: jnp.ndarray | None = None, plus_one: bool = True) -> jnp.ndarray:
    """Greedy NMS. boxes (N,4), scores (N,), valid (N,) bool -> keep (N,) bool."""
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    masked_scores = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-masked_scores, stable=True)  # score-descending ranks
    sboxes = boxes[order]
    svalid = valid[order]
    overlap = iou(sboxes, sboxes, plus_one=plus_one) > iou_threshold  # (N, N)

    def body(i, state):
        keep, suppressed = state
        keep_i = svalid[i] & ~suppressed[i]
        keep = keep.at[i].set(keep_i)
        # a kept box suppresses all later boxes it overlaps
        later = jnp.arange(n) > i
        suppressed = suppressed | (keep_i & later & overlap[i])
        return keep, suppressed

    keep_sorted, _ = jax.lax.fori_loop(
        0, n, body, (jnp.zeros((n,), bool), jnp.zeros((n,), bool))
    )
    # scatter keep decisions back to original positions
    return jnp.zeros((n,), bool).at[order].set(keep_sorted)


@partial(jax.jit, static_argnames=("plus_one",))
def batched_nms_mask(boxes: jnp.ndarray, scores: jnp.ndarray, class_ids: jnp.ndarray,
                     iou_threshold: float, valid: jnp.ndarray | None = None,
                     plus_one: bool = True) -> jnp.ndarray:
    """Per-class NMS in one pass: boxes of different `class_ids` never suppress
    each other. Replaces the reference's python loop over classes
    (lib/sttran.py:214-232) with a single masked kernel.
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    masked_scores = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-masked_scores, stable=True)
    sboxes = boxes[order]
    svalid = valid[order]
    scls = class_ids[order]
    same_class = scls[:, None] == scls[None, :]
    overlap = (iou(sboxes, sboxes, plus_one=plus_one) > iou_threshold) & same_class

    def body(i, state):
        keep, suppressed = state
        keep_i = svalid[i] & ~suppressed[i]
        keep = keep.at[i].set(keep_i)
        later = jnp.arange(n) > i
        suppressed = suppressed | (keep_i & later & overlap[i])
        return keep, suppressed

    keep_sorted, _ = jax.lax.fori_loop(
        0, n, body, (jnp.zeros((n,), bool), jnp.zeros((n,), bool))
    )
    return jnp.zeros((n,), bool).at[order].set(keep_sorted)


@partial(jax.jit, static_argnames=("k", "plus_one"))
def nms_topk(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float,
             k: int, valid: jnp.ndarray | None = None,
             class_ids: jnp.ndarray | None = None,
             plus_one: bool = True) -> tuple[jnp.ndarray, jnp.ndarray]:
    """First k boxes kept by greedy NMS: (indices (k,), keep_valid (k,)).

    Greedy NMS visits boxes in score order, so its first k survivors are
    exactly k rounds of pick-argmax + suppress-overlaps. When only the top k
    matter (RPN post-NMS 300, detections 100), this turns the O(N) sequential
    scan of nms_mask into O(k) — 20x fewer sequential steps for the RPN's
    6000-box working set — and never materializes an N x N IoU matrix.

    With `class_ids`, boxes of different classes never suppress each other
    (per-class NMS).
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    live_scores = jnp.where(valid, scores, NEG_INF)

    def body(carry, _):
        live = carry
        i = jnp.argmax(live)
        ok = live[i] > NEG_INF / 2
        row = iou(boxes[i][None], boxes, plus_one=plus_one)[0] > iou_threshold
        if class_ids is not None:
            row = row & (class_ids == class_ids[i])
        live = jnp.where(row, NEG_INF, live)
        live = live.at[i].set(NEG_INF)  # defensive: self always leaves the pool
        return live, (jnp.where(ok, i, 0).astype(jnp.int32), ok)

    _, (idx, ok) = jax.lax.scan(body, live_scores, None, length=k)
    return idx, ok

"""Box geometry as pure, broadcastable XLA math.

Replaces three separate native implementations in the reference with one
vectorized library:
  * Cython `bbox_overlaps` with the legacy +1-pixel convention
    (lib/fpn/box_intersections_cpu/bbox.pyx:21-61) -> `iou(..., plus_one=True)`
  * torchvision-style exact IoU / generalized IoU
    (models/box_ops.py / lib/matcher.py:34-68) -> `iou`, `generalized_iou`
  * `center_size` with the +1 width convention (lib/fpn/box_utils.py:51-63)

All functions take xyxy boxes, work under vmap, and accept masks via the
caller zero-padding: degenerate all-zero boxes produce finite outputs (unions
are clamped, divisions are guarded) so padded entries never generate NaNs
inside jit.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def box_area(boxes: jnp.ndarray, plus_one: bool = False) -> jnp.ndarray:
    off = 1.0 if plus_one else 0.0
    return (boxes[..., 2] - boxes[..., 0] + off) * (boxes[..., 3] - boxes[..., 1] + off)


def iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray, plus_one: bool = False) -> jnp.ndarray:
    """Pairwise IoU: (..., N, 4) x (..., M, 4) -> (..., N, M)."""
    off = 1.0 if plus_one else 0.0
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt + off, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(boxes1, plus_one)[..., :, None] + box_area(boxes2, plus_one)[..., None, :] - inter
    return inter / jnp.maximum(union, _EPS)


def intersection_ratio(boxes1: jnp.ndarray, boxes2: jnp.ndarray, plus_one: bool = True) -> jnp.ndarray:
    """Fraction of each boxes2 area covered by each boxes1 box: (N, M).

    Semantics of Cython `bbox_intersections` (bbox.pyx:71-108): normalizes the
    pairwise intersection by the *query* (second argument) box area.
    """
    off = 1.0 if plus_one else 0.0
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt + off, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / jnp.maximum(box_area(boxes2, plus_one)[..., None, :], _EPS)


def generalized_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise gIoU (lib/matcher.py:49-68), guarded for degenerate boxes."""
    i = iou(boxes1, boxes2)
    lt = jnp.minimum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.maximum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    hull = wh[..., 0] * wh[..., 1]
    inter_lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    inter_rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    inter_wh = jnp.clip(inter_rb - inter_lt, 0.0)
    inter = inter_wh[..., 0] * inter_wh[..., 1]
    union = box_area(boxes1)[..., :, None] + box_area(boxes2)[..., None, :] - inter
    return i - (hull - union) / jnp.maximum(hull, _EPS)


def center_size(boxes: jnp.ndarray) -> jnp.ndarray:
    """xyxy -> (cx, cy, w, h) with the +1 size convention (box_utils.py:51-63).

    This exact form feeds the models' positional embeddings, so the +1 must
    match the reference for weight-level parity.
    """
    wh = boxes[..., 2:] - boxes[..., :2] + 1.0
    return jnp.concatenate([boxes[..., :2] + 0.5 * wh, wh], axis=-1)


def xyxy_to_cxcywh(boxes: jnp.ndarray) -> jnp.ndarray:
    wh = boxes[..., 2:] - boxes[..., :2]
    return jnp.concatenate([boxes[..., :2] + 0.5 * wh, wh], axis=-1)


def cxcywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    half = 0.5 * boxes[..., 2:]
    return jnp.concatenate([boxes[..., :2] - half, boxes[..., :2] + half], axis=-1)


def xyxy_to_xywh(boxes: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([boxes[..., :2], boxes[..., 2:] - boxes[..., :2]], axis=-1)


def xywh_to_cxcywh(boxes: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([boxes[..., :2] + 0.5 * boxes[..., 2:], boxes[..., 2:]], axis=-1)


def union_boxes(boxes: jnp.ndarray, pair_idx: jnp.ndarray) -> jnp.ndarray:
    """Per-pair union boxes (min corners / max corners).

    Same math as the reference's inline construction
    (lib/assign_pseudo_label.py:1328-1332) but as one gather + elementwise op.
    boxes: (N, 4) xyxy; pair_idx: (R, 2) int -> (R, 4).
    """
    subj = boxes[pair_idx[..., 0]]
    obj = boxes[pair_idx[..., 1]]
    return jnp.concatenate(
        [jnp.minimum(subj[..., :2], obj[..., :2]), jnp.maximum(subj[..., 2:], obj[..., 2:])],
        axis=-1,
    )

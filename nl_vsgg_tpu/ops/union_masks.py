"""Union-box spatial mask rasterization (`draw_union_boxes`) as closed-form XLA.

The reference computes these (N, 2, P, P) soft masks with a Cython triple loop
on the CPU, forcing a GPU->CPU->GPU round trip every training step
(lib/draw_rectangles/draw_rectangles.pyx:27-67, called at
lib/assign_pseudo_label.py:1359-1363). The math is separable: each pixel's
value is the product of an x-ramp and a y-ramp,

    ramp(j; a, b) = clip(j + 1 - a, 0, 1) * clip(b - j, 0, 1)

so the whole mask is an outer product of two P-vectors per (pair, channel).
That makes it a pair of (R, 2, P) ramp tensors and one broadcasted multiply —
fully fused by XLA, runs on-device, vmaps over any batch dims, and is
differentiable for free.

Output layout is NHWC ((R, P, P, 2)) — the TPU-native channel-last layout
consumed by our conv stack; use `as_nchw=True` for reference-layout parity
checks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def draw_union_boxes(pair_rois: jnp.ndarray, pooling_size: int = 27,
                     as_nchw: bool = False) -> jnp.ndarray:
    """Rasterize subject+object boxes into union-box-normalized soft masks.

    pair_rois: (..., R, 8) — [subj xyxy, obj xyxy] per pair.
    Returns (..., R, P, P, 2) float32 (or (..., R, 2, P, P) if as_nchw).
    Degenerate (all-zero) padded pairs yield finite outputs.
    """
    P = pooling_size
    boxes = pair_rois.reshape(*pair_rois.shape[:-1], 2, 4)  # (..., R, 2, 4)

    x1u = jnp.min(boxes[..., 0], axis=-1, keepdims=True)  # (..., R, 1)
    y1u = jnp.min(boxes[..., 1], axis=-1, keepdims=True)
    x2u = jnp.max(boxes[..., 2], axis=-1, keepdims=True)
    y2u = jnp.max(boxes[..., 3], axis=-1, keepdims=True)
    w = jnp.maximum(x2u - x1u, 1e-8)
    h = jnp.maximum(y2u - y1u, 1e-8)

    # box corners in [0, P] union-normalized coordinates, per channel
    x1 = (boxes[..., 0] - x1u) * P / w  # (..., R, 2)
    y1 = (boxes[..., 1] - y1u) * P / h
    x2 = (boxes[..., 2] - x1u) * P / w
    y2 = (boxes[..., 3] - y1u) * P / h

    grid = jnp.arange(P, dtype=pair_rois.dtype)  # pixel index j
    # ramp(j) = clip(j+1-lo, 0, 1) * clip(hi-j, 0, 1), broadcast over (..., R, 2, P)
    def ramps(lo, hi):
        g = grid.reshape((1,) * lo.ndim + (P,))
        return (jnp.clip(g + 1.0 - lo[..., None], 0.0, 1.0)
                * jnp.clip(hi[..., None] - g, 0.0, 1.0))

    yr = ramps(y1, y2)  # (..., R, 2, P)
    xr = ramps(x1, x2)  # (..., R, 2, P)
    masks = yr[..., :, None] * xr[..., None, :]  # (..., R, 2, P, P)
    if as_nchw:
        return masks
    return jnp.moveaxis(masks, -3, -1)  # (..., R, P, P, 2)


draw_union_boxes_jit = jax.jit(draw_union_boxes, static_argnames=("pooling_size", "as_nchw"))


def draw_union_boxes_np(pair_rois, pooling_size: int = 27,
                        as_nchw: bool = False):
    """Numpy twin of draw_union_boxes for the HOST data path.

    Grounding runs on worker threads; dispatching the mask math to the
    default device from there costs two device round trips per video (and on
    a tunneled chip, ~50 ms of transfer latency each). Same closed form,
    parity-tested against the XLA version.
    """
    import numpy as np
    pair_rois = np.asarray(pair_rois, np.float32)
    P = pooling_size
    boxes = pair_rois.reshape(*pair_rois.shape[:-1], 2, 4)

    x1u = boxes[..., 0].min(-1, keepdims=True)
    y1u = boxes[..., 1].min(-1, keepdims=True)
    x2u = boxes[..., 2].max(-1, keepdims=True)
    y2u = boxes[..., 3].max(-1, keepdims=True)
    w = np.maximum(x2u - x1u, 1e-8)
    h = np.maximum(y2u - y1u, 1e-8)

    x1 = (boxes[..., 0] - x1u) * P / w
    y1 = (boxes[..., 1] - y1u) * P / h
    x2 = (boxes[..., 2] - x1u) * P / w
    y2 = (boxes[..., 3] - y1u) * P / h

    grid = np.arange(P, dtype=np.float32)

    def ramps(lo, hi):
        g = grid.reshape((1,) * lo.ndim + (P,))
        return (np.clip(g + 1.0 - lo[..., None], 0.0, 1.0)
                * np.clip(hi[..., None] - g, 0.0, 1.0))

    yr = ramps(y1, y2)
    xr = ramps(x1, x2)
    masks = yr[..., :, None] * xr[..., None, :]
    if as_nchw:
        return masks
    return np.moveaxis(masks, -3, -1)

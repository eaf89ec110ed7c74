"""RoIAlign for TPU.

Replaces fasterRCNN/lib/model/csrc/cuda/ROIAlign_cuda.cu (wrapped as
`ROIAlign((7,7), 1/16, 0)` at fasterRCNN/lib/model/roi_layers/roi_align.py and
used by lib/sttran.py:36, lib/dsg_detr.py:96) with a vectorized XLA gather
formulation:

  * legacy coordinate semantics (aligned=False): roi corners scaled by
    `spatial_scale` with no half-pixel offset, roi size clamped to >= 1,
  * bilinear interpolation with the CUDA kernel's boundary rule
    (samples with y < -1 or y > H return 0; in-range samples clamp to edges),
  * a *static* sampling grid per bin (default 2x2). The CUDA kernel's
    sampling_ratio=0 mode picks ceil(roi_size/bin) samples per roi — a
    data-dependent shape that cannot be compiled; a fixed 2x2 grid is the
    standard detectron2 setting and is within interpolation error of the
    adaptive grid at the 7x7 output size used here.

The whole op is one fused gather + weighted-sum graph: vmapped over rois,
differentiable (autodiff gives the scatter backward for free), and batchable
across frames. Feature maps are channel-last (H, W, C) — the TPU layout.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _bilinear_sample(fmap: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Sample fmap (H, W, C) at fractional positions y, x (both shape S).

    Implements the CUDA kernel's `bilinear_interpolate`: out-of-range by more
    than one pixel -> 0; otherwise clamp into the valid range.
    """
    H, W, _ = fmap.shape
    in_range = (y >= -1.0) & (y <= H) & (x >= -1.0) & (x <= W)
    y = jnp.clip(y, 0.0, H - 1)
    x = jnp.clip(x, 0.0, W - 1)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 1)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    ly = y - y0.astype(y.dtype)
    lx = x - x0.astype(x.dtype)
    hy = 1.0 - ly
    hx = 1.0 - lx

    def g(yy, xx):
        return fmap[yy, xx]  # (S..., C) advanced-index gather

    val = (g(y0, x0) * (hy * hx)[..., None] + g(y0, x1) * (hy * lx)[..., None]
           + g(y1, x0) * (ly * hx)[..., None] + g(y1, x1) * (ly * lx)[..., None])
    return jnp.where(in_range[..., None], val, 0.0)


def _roi_align_one(fmap: jnp.ndarray, roi: jnp.ndarray, output_size: tuple[int, int],
                   spatial_scale: float, sampling_ratio: int) -> jnp.ndarray:
    ph, pw = output_size
    sr = sampling_ratio
    x1, y1, x2, y2 = roi[0], roi[1], roi[2], roi[3]
    sx1, sy1 = x1 * spatial_scale, y1 * spatial_scale
    sx2, sy2 = x2 * spatial_scale, y2 * spatial_scale
    roi_w = jnp.maximum(sx2 - sx1, 1.0)
    roi_h = jnp.maximum(sy2 - sy1, 1.0)
    bin_w = roi_w / pw
    bin_h = roi_h / ph

    iy = (jnp.arange(sr, dtype=fmap.dtype) + 0.5) / sr  # sample offsets in a bin
    ix = (jnp.arange(sr, dtype=fmap.dtype) + 0.5) / sr
    py = jnp.arange(ph, dtype=fmap.dtype)
    px = jnp.arange(pw, dtype=fmap.dtype)
    # sample grid: (ph, sr) and (pw, sr)
    ys = sy1 + (py[:, None] + iy[None, :]) * bin_h  # (ph, sr)
    xs = sx1 + (px[:, None] + ix[None, :]) * bin_w  # (pw, sr)
    # full (ph, sr, pw, sr) coordinate lattice
    Y = jnp.broadcast_to(ys[:, :, None, None], (ph, sr, pw, sr))
    X = jnp.broadcast_to(xs[None, None, :, :], (ph, sr, pw, sr))
    samples = _bilinear_sample(fmap, Y, X)  # (ph, sr, pw, sr, C)
    return samples.mean(axis=(1, 3))  # (ph, pw, C)


@partial(jax.jit, static_argnames=("output_size", "spatial_scale", "sampling_ratio"))
def roi_align(fmap: jnp.ndarray, rois: jnp.ndarray,
              output_size: tuple[int, int] = (7, 7), spatial_scale: float = 1.0 / 16.0,
              sampling_ratio: int = 2) -> jnp.ndarray:
    """RoIAlign on a single feature map.

    fmap: (H, W, C) channel-last; rois: (R, 4) xyxy in image coordinates.
    Returns (R, ph, pw, C).
    """
    fn = partial(_roi_align_one, fmap, output_size=output_size,
                 spatial_scale=spatial_scale, sampling_ratio=sampling_ratio)
    return jax.vmap(fn)(rois)


@partial(jax.jit, static_argnames=("output_size", "spatial_scale", "sampling_ratio"))
def roi_align_frames(fmaps: jnp.ndarray, rois: jnp.ndarray, frame_idx: jnp.ndarray,
                     output_size: tuple[int, int] = (7, 7),
                     spatial_scale: float = 1.0 / 16.0,
                     sampling_ratio: int = 2) -> jnp.ndarray:
    """RoIAlign where each roi indexes a frame of a stacked (F, H, W, C) map.

    Replaces the reference's per-frame python loop over
    `extract_feature_given_bbox_base_feat_torch` (lib/object_detector.py:100-106)
    with a single gather: the roi's frame map is selected with one dynamic
    index and all rois run in one vmapped kernel.
    """
    def one(roi, f):
        return _roi_align_one(fmaps[f], roi, output_size=output_size,
                              spatial_scale=spatial_scale, sampling_ratio=sampling_ratio)

    return jax.vmap(one)(rois, frame_idx)


def roi_pool(fmap: jnp.ndarray, rois: jnp.ndarray,
             output_size: tuple[int, int] = (7, 7),
             spatial_scale: float = 1.0 / 16.0) -> jnp.ndarray:
    """Legacy max RoIPool (fasterRCNN csrc ROIPool_cuda.cu), for API parity.

    Quantized bin edges + max over each bin, computed as a masked max over the
    full map per (roi, bin) — exported but unused on the reference's live
    paths (SURVEY.md 2.8), so simplicity over speed is fine here.
    """
    H, W, C = fmap.shape
    ph, pw = output_size

    def one(roi):
        x1 = jnp.round(roi[0] * spatial_scale).astype(jnp.int32)
        y1 = jnp.round(roi[1] * spatial_scale).astype(jnp.int32)
        x2 = jnp.round(roi[2] * spatial_scale).astype(jnp.int32)
        y2 = jnp.round(roi[3] * spatial_scale).astype(jnp.int32)
        roi_h = jnp.maximum(y2 - y1 + 1, 1)
        roi_w = jnp.maximum(x2 - x1 + 1, 1)
        py = jnp.arange(ph)
        px = jnp.arange(pw)
        hstart = y1 + jnp.floor(py * roi_h / ph).astype(jnp.int32)
        hend = y1 + jnp.ceil((py + 1) * roi_h / ph).astype(jnp.int32)
        wstart = x1 + jnp.floor(px * roi_w / pw).astype(jnp.int32)
        wend = x1 + jnp.ceil((px + 1) * roi_w / pw).astype(jnp.int32)
        ys = jnp.arange(H)
        xs = jnp.arange(W)
        ymask = (ys[None, :] >= jnp.clip(hstart, 0, H)[:, None]) & (
            ys[None, :] < jnp.clip(hend, 0, H)[:, None])  # (ph, H)
        xmask = (xs[None, :] >= jnp.clip(wstart, 0, W)[:, None]) & (
            xs[None, :] < jnp.clip(wend, 0, W)[:, None])  # (pw, W)
        m = ymask[:, None, :, None] & xmask[None, :, None, :]  # (ph, pw, H, W)
        vals = jnp.where(m[..., None], fmap[None, None], -jnp.inf)
        out = vals.max(axis=(2, 3))
        return jnp.where(jnp.isfinite(out), out, 0.0)

    return jax.vmap(one)(rois)

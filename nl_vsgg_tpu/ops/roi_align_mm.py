"""RoIAlign as separable matrix multiplication — the MXU formulation.

Bilinear RoIAlign with average pooling is a *separable linear map* of the
feature map: for each roi,

    out[p, q, c] = sum_{h, w} Wy[p, h] * Wx[q, w] * fmap[h, w, c]

where Wy (ph, H) carries each output row's averaged bilinear sample weights
and Wx (pw, W) likewise for columns. Two matmuls per roi instead of 4
gathers per sample point — this is where the FLOPs belong on TPU (guide:
keep compute on the 128x128 systolic array, avoid gather/scatter).

Semantics match ops/roi_align.py (legacy aligned=False coordinates, roi size
clamped >= 1, fixed sampling grid, CUDA boundary rule: samples beyond one
pixel outside contribute 0, in-range samples clamp to the edge) — pinned by
tests against the gather version, which itself is golden-tested against the
reference CUDA semantics.

A Pallas kernel of the same math (grid over roi x channel tiles, weights
built in VMEM) lives in pallas_roi_align.py; this XLA version is the default
because XLA already fuses the weight construction + two dots cleanly.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _axis_weights(start: jnp.ndarray, bin_size: jnp.ndarray, n_bins: int,
                  n_samples: int, axis_len: int, dtype) -> jnp.ndarray:
    """(n_bins, axis_len) averaged bilinear weights along one axis."""
    offs = (jnp.arange(n_samples, dtype=dtype) + 0.5) / n_samples
    pos = start + (jnp.arange(n_bins, dtype=dtype)[:, None] + offs[None, :]) * bin_size
    # CUDA bilinear_interpolate boundary rule
    in_range = (pos >= -1.0) & (pos <= axis_len)
    p = jnp.clip(pos, 0.0, axis_len - 1)
    p0 = jnp.floor(p)
    frac = p - p0
    i0 = p0.astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, axis_len - 1)
    idx = jnp.arange(axis_len, dtype=jnp.int32)
    w0 = jnp.where(in_range, 1.0 - frac, 0.0)[..., None] * (i0[..., None] == idx)
    w1 = jnp.where(in_range, frac, 0.0)[..., None] * (i1[..., None] == idx)
    # average over the bin's sample points
    return (w0 + w1).sum(axis=1) / n_samples  # (n_bins, axis_len)


def _one(fmap, roi, output_size, spatial_scale, sampling_ratio):
    H, W, C = fmap.shape
    ph, pw = output_size
    dt = fmap.dtype
    sx1 = roi[0] * spatial_scale
    sy1 = roi[1] * spatial_scale
    roi_w = jnp.maximum(roi[2] * spatial_scale - sx1, 1.0)
    roi_h = jnp.maximum(roi[3] * spatial_scale - sy1, 1.0)
    wy = _axis_weights(sy1, roi_h / ph, ph, sampling_ratio, H, dt)  # (ph, H)
    wx = _axis_weights(sx1, roi_w / pw, pw, sampling_ratio, W, dt)  # (pw, W)
    # (ph, H) @ (H, W*C) -> (ph, W, C); then contract W with wx
    t = jnp.einsum("ph,hwc->pwc", wy, fmap, preferred_element_type=dt,
                   precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("qw,pwc->pqc", wx, t, preferred_element_type=dt,
                      precision=jax.lax.Precision.HIGHEST)


@partial(jax.jit, static_argnames=("output_size", "spatial_scale", "sampling_ratio"))
def roi_align_mm(fmap: jnp.ndarray, rois: jnp.ndarray,
                 output_size: tuple[int, int] = (7, 7),
                 spatial_scale: float = 1.0 / 16.0,
                 sampling_ratio: int = 2) -> jnp.ndarray:
    """fmap (H, W, C), rois (R, 4) xyxy -> (R, ph, pw, C)."""
    fn = partial(_one, fmap, output_size=output_size,
                 spatial_scale=spatial_scale, sampling_ratio=sampling_ratio)
    return jax.vmap(fn)(rois)


@partial(jax.jit, static_argnames=("output_size", "spatial_scale", "sampling_ratio"))
def roi_align_mm_frames(fmaps: jnp.ndarray, rois: jnp.ndarray,
                        frame_idx: jnp.ndarray,
                        output_size: tuple[int, int] = (7, 7),
                        spatial_scale: float = 1.0 / 16.0,
                        sampling_ratio: int = 2) -> jnp.ndarray:
    """Stacked (F, H, W, C) maps; each roi picks its frame."""
    def one(roi, f):
        return _one(fmaps[f], roi, output_size=output_size,
                    spatial_scale=spatial_scale, sampling_ratio=sampling_ratio)

    return jax.vmap(one)(rois, frame_idx)

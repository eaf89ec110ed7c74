"""Pallas TPU kernel for RoIAlign (separable-matmul formulation).

Grid: (num_rois, C // C_TILE). Each program builds its roi's per-axis
bilinear weight matrices in VMEM (iota math, no gathers) and contracts the
feature-map tile with two MXU matmuls:

    out[p, q, c] = Wy[p, :] @ fmap[:, :, c] @ Wx[q, :]^T

The feature map arrives per-program as an (H, W, C_TILE) VMEM block selected
by the channel grid axis; roi boxes are scalar-prefetched so weight
construction happens before the tile lands. Same semantics as
ops/roi_align_mm.py (legacy coordinates, clamp >= 1, fixed sampling grid,
CUDA boundary rule), pinned by parity tests.

Use when C is large (the VinVL C4 map: C=1024 -> 8 channel tiles of 128);
for tiny feature maps the XLA version is equally good.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C_TILE = 128


def _axis_weights_k(start, bin_size, n_bins, n_samples, axis_len, dtype):
    # TPU iota must be integer-typed (and >= 2-D); cast after
    offs = (jax.lax.broadcasted_iota(jnp.int32, (1, n_samples), 1)
            .astype(dtype) + 0.5) / n_samples
    bins = jax.lax.broadcasted_iota(jnp.int32, (n_bins, 1), 0).astype(dtype)
    pos = start + (bins + offs) * bin_size              # (n_bins, S)
    in_range = (pos >= -1.0) & (pos <= axis_len)
    p = jnp.clip(pos, 0.0, axis_len - 1)
    p0 = jnp.floor(p)
    frac = p - p0
    i0 = p0.astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, axis_len - 1)
    idx = jax.lax.broadcasted_iota(jnp.int32, (n_bins, n_samples, axis_len), 2)
    w0 = jnp.where(in_range, 1.0 - frac, 0.0)[..., None] * (i0[..., None] == idx)
    w1 = jnp.where(in_range, frac, 0.0)[..., None] * (i1[..., None] == idx)
    return (w0 + w1).sum(axis=1) / n_samples            # (n_bins, axis_len)


def _kernel(rois_ref, fmap_ref, out_ref, *, ph, pw, scale, sampling, H, W):
    r = pl.program_id(0)
    dt = fmap_ref.dtype
    x1 = rois_ref[r, 0] * scale
    y1 = rois_ref[r, 1] * scale
    roi_w = jnp.maximum(rois_ref[r, 2] * scale - x1, 1.0)
    roi_h = jnp.maximum(rois_ref[r, 3] * scale - y1, 1.0)
    wy = _axis_weights_k(y1, roi_h / ph, ph, sampling, H, dt)   # (ph, H)
    wx = _axis_weights_k(x1, roi_w / pw, pw, sampling, W, dt)   # (pw, W)
    fm = fmap_ref[:]                                            # (H, W, Ct)
    t = jax.lax.dot_general(wy, fm.reshape(H, W * fm.shape[-1]),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
    t = t.reshape(ph, W, fm.shape[-1])                          # (ph, W, Ct)
    out = jax.lax.dot_general(wx, t, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)  # (pw, ph, Ct)
    out_ref[0] = out.swapaxes(0, 1).astype(dt)                  # (ph, pw, Ct)


@partial(jax.jit, static_argnames=("output_size", "spatial_scale", "sampling_ratio"))
def roi_align_pallas(fmap: jnp.ndarray, rois: jnp.ndarray,
                     output_size: tuple[int, int] = (7, 7),
                     spatial_scale: float = 1.0 / 16.0,
                     sampling_ratio: int = 2) -> jnp.ndarray:
    """fmap (H, W, C) with C % 128 == 0, rois (R, 4) -> (R, ph, pw, C)."""
    H, W, C = fmap.shape
    R = rois.shape[0]
    ph, pw = output_size
    assert C % C_TILE == 0, f"channels {C} must tile by {C_TILE}"
    n_ct = C // C_TILE

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # rois
        grid=(R, n_ct),
        in_specs=[pl.BlockSpec((H, W, C_TILE), lambda r, c, rois: (0, 0, c),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, ph, pw, C_TILE),
                               lambda r, c, rois: (r, 0, 0, c),
                               memory_space=pltpu.VMEM),
    )
    kernel = partial(_kernel, ph=ph, pw=pw, scale=spatial_scale,
                     sampling=sampling_ratio, H=H, W=W)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, ph, pw, C), fmap.dtype),
    )(rois.astype(fmap.dtype), fmap)

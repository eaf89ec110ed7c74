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
    r = pl.program_id(1)
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


R_TILE = 8


def _kernel_tiled(wy_ref, wx_ref, fmT_ref, out_ref, *, ph, pw, H, W, prec):
    """8 rois per step, zero in-kernel transposes, no HBM intermediate.

    dot1 stacks the 8 rois' x-weights into one (8*pw, W) matrix (M=112 of
    128 MXU sublanes vs 14 for a per-roi dot) against the pre-transposed
    feature block (W, H*Ct); dot2 is a batched contraction over H that lands
    directly in the (roi, ph, pw, Ct) output layout.

    Measured on TPU v5e (300 rois, 14x14 out, C=1024, fp32 HIGHEST): 5.1 ms
    vs 5.3 ms for the XLA mm formulation — a TIE, because both are bound by
    the same hardware truth: the separable contractions have K in {50, 64},
    filling <=half of the MXU's 128-deep systolic array, and fp32-HIGHEST
    triples the passes. (The naive per-roi grid was 9-11 ms; roi stacking
    and keeping the fmap block resident across the inner grid axis are what
    closed that gap.) XLA's mm wins at DEFAULT precision (3.2 vs 3.7 ms), so
    roi_align_mm remains the production default.
    """
    dt = fmT_ref.dtype
    Ct = fmT_ref.shape[-1]
    fmT = fmT_ref[:].reshape(W, H * Ct)
    wx = wx_ref[:].reshape(R_TILE * pw, W)
    # (R*pw, W) @ (W, H*Ct) -> (R*pw, H*Ct)
    t = jax.lax.dot_general(wx, fmT, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32, precision=prec)
    t4 = t.reshape(R_TILE, pw, H, Ct)
    # batch r, contract H: (R, ph, H) x (R, pw, H, Ct) -> (R, ph, pw, Ct)
    out = jax.lax.dot_general(wy_ref[:], t4, (((2,), (2,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32,
                              precision=prec)
    out_ref[:] = out.astype(dt)


@partial(jax.jit, static_argnames=("output_size", "spatial_scale",
                                   "sampling_ratio", "precision", "interpret"))
def roi_align_pallas_tiled(fmap: jnp.ndarray, rois: jnp.ndarray,
                           output_size: tuple[int, int] = (7, 7),
                           spatial_scale: float = 1.0 / 16.0,
                           sampling_ratio: int = 2,
                           precision=jax.lax.Precision.HIGHEST,
                           interpret: bool = False) -> jnp.ndarray:
    """fmap (H, W, C) with C % 128 == 0, rois (R, 4) -> (R, ph, pw, C).

    Weight matrices are precomputed in XLA (tiny); the kernel runs two fused
    MXU dots per (channel-tile, 8-roi group) step. `interpret=True` runs the
    Pallas interpreter (CPU parity tests). See _kernel_tiled for measured
    perf vs roi_align_mm.
    """
    from .roi_align_mm import _axis_weights

    H, W, C = fmap.shape
    R = rois.shape[0]
    ph, pw = output_size
    assert C % C_TILE == 0, f"channels {C} must tile by {C_TILE}"
    n_ct = C // C_TILE
    dt = fmap.dtype

    def weights(roi):
        sx1 = roi[0] * spatial_scale
        sy1 = roi[1] * spatial_scale
        roi_w = jnp.maximum(roi[2] * spatial_scale - sx1, 1.0)
        roi_h = jnp.maximum(roi[3] * spatial_scale - sy1, 1.0)
        wy = _axis_weights(sy1, roi_h / ph, ph, sampling_ratio, H, dt)
        wx = _axis_weights(sx1, roi_w / pw, pw, sampling_ratio, W, dt)
        return wy, wx

    wy_all, wx_all = jax.vmap(weights)(rois)  # (R, ph, H), (R, pw, W)
    r_pad = (-R) % R_TILE
    if r_pad:
        wy_all = jnp.concatenate(
            [wy_all, jnp.zeros((r_pad, ph, H), dt)], 0)
        wx_all = jnp.concatenate(
            [wx_all, jnp.zeros((r_pad, pw, W), dt)], 0)
    n_groups = (R + r_pad) // R_TILE
    fmT = jnp.swapaxes(fmap, 0, 1)  # (W, H, C), fused upstream by XLA

    grid_spec = pl.GridSpec(
        grid=(n_ct, n_groups),  # c outer: the fmap block stays resident
        in_specs=[
            pl.BlockSpec((R_TILE, ph, H), lambda c, g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_TILE, pw, W), lambda c, g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W, H, C_TILE), lambda c, g: (0, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R_TILE, ph, pw, C_TILE),
                               lambda c, g: (g, 0, 0, c),
                               memory_space=pltpu.VMEM),
    )
    kernel = partial(_kernel_tiled, ph=ph, pw=pw, H=H, W=W, prec=precision)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R + r_pad, ph, pw, C), dt),
        interpret=interpret,
    )(wy_all, wx_all, fmT)
    return out[:R]


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

    # channel tile OUTER, roi INNER: the (H, W, C_TILE) fmap block's index is
    # then constant across the whole inner roi sweep, so Pallas fetches it
    # n_ct times total instead of once per (roi, tile) step — the roi-fastest
    # order re-fetched 1.6 MB x R x n_ct from HBM and was 10x off roofline
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # rois
        grid=(n_ct, R),
        in_specs=[pl.BlockSpec((H, W, C_TILE), lambda c, r, rois: (0, 0, c),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, ph, pw, C_TILE),
                               lambda c, r, rois: (r, 0, 0, c),
                               memory_space=pltpu.VMEM),
    )
    kernel = partial(_kernel, ph=ph, pw=pw, scale=spatial_scale,
                     sampling=sampling_ratio, H=H, W=W)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, ph, pw, C), fmap.dtype),
    )(rois.astype(fmap.dtype), fmap)

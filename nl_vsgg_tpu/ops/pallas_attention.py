"""Pallas TPU kernel: fused masked multi-head attention with custom VJP.

The relation transformers (models/sttran.py, models/dsg_detr.py) express
every structural grouping — same-frame, same-window, same-tracklet — as a
boolean (Q, K) allow matrix over flat token arrays (replacing the
reference's pad_sequence/python-window loops, lib/transformer_wk.py:130-217,
lib/dsg_detr.py:536-564). Their token counts are small (tens to a few
hundred relations), so a whole (Lq, Lk) attention head fits VMEM and the
XLA-path costs are not the dots but the traffic around them: materialized
logits/probability tensors, the -inf mask select, softmax, dropout masks,
and the (L, H, D) head transposes (head dim 1936/8 = 242 is not
lane-aligned). This kernel fuses mask + softmax + probability-dropout +
both dots into one VMEM-resident program per head; the backward pass is a
second kernel that recomputes probabilities flash-attention-style from the
stored log-sum-exp (probabilities never touch HBM in either direction).

Layout contract (per video — the models are vmapped over the batch):
    q: (Lq, H, Dp), k/v: (Lk, H, Dp), bias: (Lq, Lk) fp32, seed: (1,) int32
with Dp a multiple of 128 (the caller zero-pads head dim 242 -> 256; zero
pad lanes stay zero through q@k^T, probs@v, and all gradients, so padding
is exact). `bias` is 0 where attention is allowed and NEG_INF elsewhere —
it is a constant mask, not a parameter (its VJP is zero/None).

Semantics pinned against the XLA path (models/layers.py::MaskedMHA):
softmax over allowed keys only; rows with NO allowed key output zeros;
probability dropout at `rate` with inverted scaling. Dropout bits come from
the TPU PRNG seeded per (video-seed, head), regenerated identically in the
backward kernel — same trick as flash attention, so the keep mask is never
stored. The random stream differs from flax's Dropout (training is
stochastic either way); deterministic mode is numerically equivalent to the
XLA path within bf16/fp32 accumulation noise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
_ROW_VALID = -1e29  # rows whose max logit is below this saw only -inf bias


def _keep_mask(seed, h, rate, shape):
    """Regenerate the dropout keep mask for (seed, head) — identical in
    forward and backward. threshold compares raw uint32 bits."""
    pltpu.prng_seed(seed, h)
    bits = pltpu.prng_random_bits(shape)  # uint32
    threshold = jnp.uint32(min(int(rate * (1 << 32)), (1 << 32) - 1))
    return bits >= threshold


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, out_ref, lse_ref,
                *, scale, rate, det):
    h = pl.program_id(0)
    seed = seed_ref[0, 0]
    q = q_ref[0]
    k = k_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale + bias_ref[:]
    mx = jnp.max(logits, axis=-1, keepdims=True)
    row_valid = mx > _ROW_VALID
    e = jnp.exp(logits - mx)
    s = jnp.sum(e, axis=-1, keepdims=True)
    p = jnp.where(row_valid, e / s, 0.0)
    lse_ref[0, 0, :] = jnp.where(row_valid[:, 0], mx[:, 0] + jnp.log(s[:, 0]),
                                 NEG_INF)
    if rate > 0.0 and not det:
        keep = _keep_mask(seed, h, rate, p.shape)
        p = jnp.where(keep, p / (1.0 - rate), 0.0)
    out = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[0],
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    out_ref[0] = out.astype(out_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, lse_ref, g_ref,
                dq_ref, dk_ref, dv_ref, *, scale, rate, det):
    h = pl.program_id(0)
    seed = seed_ref[0, 0]
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale + bias_ref[:]
    lse = lse_ref[0, 0, :][:, None]  # minor-dim insert on fp32 (32-bit only
    # reshapes lower on Mosaic; the bool comparison happens post-broadcast)
    row_valid = lse > _ROW_VALID
    p = jnp.where(row_valid, jnp.exp(logits - lse), 0.0)
    if rate > 0.0 and not det:
        keep = _keep_mask(seed, h, rate, p.shape)
        pt = jnp.where(keep, p / (1.0 - rate), 0.0)
    else:
        pt = p
    # dV = P~^T g ; dP~ = g V^T ; dP = keep-scaled dP~ ;
    # softmax VJP: dS = P o (dP - rowsum(dP o P)) ; dQ = dS K ; dK = dS^T Q
    dv = jax.lax.dot_general(pt.astype(g.dtype), g, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dpt = jax.lax.dot_general(g, v, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    if rate > 0.0 and not det:
        dp = jnp.where(keep, dpt / (1.0 - rate), 0.0)
    else:
        dp = dpt
    r = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = (p * (dp - r)) * scale
    dsc = ds.astype(q.dtype)
    dq = jax.lax.dot_general(dsc, k, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(dsc, q, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _spec(L, Dp):
    # head-major (H, L, Dp) layout: the per-head block (1, L, Dp) keeps the
    # last two dims equal to the array's, which Mosaic requires when L is
    # not sublane-aligned (the un-padded token counts rarely are)
    return pl.BlockSpec((1, L, Dp), lambda h: (h, 0, 0),
                        memory_space=pltpu.VMEM)


@functools.lru_cache(maxsize=None)
def _build(Lq, Lk, H, Dp, dtype_name, scale, rate, det, interpret):
    dtype = jnp.dtype(dtype_name)
    bias_spec = pl.BlockSpec((Lq, Lk), lambda h: (0, 0),
                             memory_space=pltpu.VMEM)
    # the seed rides VMEM as a (1, 128) lane-aligned row (not SMEM): under
    # the train step's vmap the batching rule prepends a squeezed block dim,
    # and only a full lane-aligned trailing plane passes Mosaic's block rule
    seed_spec = pl.BlockSpec((1, 128), lambda h: (0, 0),
                             memory_space=pltpu.VMEM)

    def fwd_call(q, k, v, bias, seed):
        return pl.pallas_call(
            functools.partial(_fwd_kernel, scale=scale, rate=rate, det=det),
            grid=(H,),
            in_specs=[seed_spec, _spec(Lq, Dp), _spec(Lk, Dp), _spec(Lk, Dp),
                      bias_spec],
            out_specs=[_spec(Lq, Dp),
                       pl.BlockSpec((1, 1, Lq), lambda h: (h, 0, 0),
                                    memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((H, Lq, Dp), dtype),
                       jax.ShapeDtypeStruct((H, 1, Lq), jnp.float32)],
            interpret=interpret,
        )(seed, q, k, v, bias)

    def bwd_call(q, k, v, bias, seed, lse, g):
        return pl.pallas_call(
            functools.partial(_bwd_kernel, scale=scale, rate=rate, det=det),
            grid=(H,),
            in_specs=[seed_spec, _spec(Lq, Dp), _spec(Lk, Dp), _spec(Lk, Dp),
                      bias_spec,
                      pl.BlockSpec((1, 1, Lq), lambda h: (h, 0, 0),
                                   memory_space=pltpu.VMEM),
                      _spec(Lq, Dp)],
            out_specs=[_spec(Lq, Dp), _spec(Lk, Dp), _spec(Lk, Dp)],
            out_shape=[jax.ShapeDtypeStruct((H, Lq, Dp), dtype),
                       jax.ShapeDtypeStruct((H, Lk, Dp), dtype),
                       jax.ShapeDtypeStruct((H, Lk, Dp), dtype)],
            interpret=interpret,
        )(seed, q, k, v, bias, lse, g)

    @jax.custom_vjp
    def mha(q, k, v, bias, seed):
        out, _ = fwd_call(q, k, v, bias, seed)
        return out

    def mha_fwd(q, k, v, bias, seed):
        out, lse = fwd_call(q, k, v, bias, seed)
        return out, (q, k, v, bias, seed, lse)

    def mha_bwd(res, g):
        q, k, v, bias, seed, lse = res
        dq, dk, dv = bwd_call(q, k, v, bias, seed, lse, g)
        return dq, dk, dv, None, None  # bias is a constant mask; seed is int

    mha.defvjp(mha_fwd, mha_bwd)
    return mha


def fused_masked_mha(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     bias: jnp.ndarray, seed: jnp.ndarray, *,
                     sm_scale: float, dropout_rate: float = 0.0,
                     deterministic: bool = True,
                     interpret: bool | None = None) -> jnp.ndarray:
    """q (Lq, H, Dp), k/v (Lk, H, Dp), bias (Lq, Lk) fp32 {0, NEG_INF},
    seed (1,) int32 -> (Lq, H, Dp). Dp % 128 == 0. Differentiable in
    q/k/v; vmap adds the video batch axis.

    Internally head-major (H, L, Dp): per-head blocks must span full
    (L, Dp) planes (Mosaic's block-alignment rule for unaligned L). The
    moveaxis sits OUTSIDE the custom VJP, so its transpose — a cheap
    lane-aligned tile shuffle at Dp % 128 == 0 — is differentiated by XLA."""
    Lq, H, Dp = q.shape
    Lk = k.shape[0]
    assert Dp % 128 == 0, f"pad head dim to a lane multiple, got {Dp}"
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    fn = _build(Lq, Lk, H, Dp, jnp.dtype(q.dtype).name, float(sm_scale),
                float(dropout_rate), bool(deterministic), bool(interpret))
    hm = functools.partial(jnp.moveaxis, source=-2, destination=-3)
    seed_row = jnp.broadcast_to(seed.reshape(1, 1), (1, 128)).astype(jnp.int32)
    out = fn(hm(q), hm(k), hm(v), bias.astype(jnp.float32), seed_row)
    return jnp.moveaxis(out, -3, -2)

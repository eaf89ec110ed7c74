"""Masked transformer building blocks and mask-aware normalization.

These replace the reference's pad_sequence/python-window machinery
(lib/transformer_wk.py:130-217, lib/dsg_detr.py:536-564) with *attention-mask
algebra over flat token arrays*: instead of materializing [len, batch, dim]
grids per frame/window/tracklet, every structural grouping (same frame, same
sliding window, same tracklet) is expressed as a boolean (Q, K) allow-matrix.
That keeps shapes static, lets XLA fuse the whole stack, and makes the models
trivially batchable/shardable.

Numerics match torch:
  * MultiheadAttention: joint softmax over heads' scaled dot products with
    -inf masking, attention-probability dropout, separate q/k/v + out proj.
  * Post-norm encoder layer (attn -> add -> LN -> FFN -> add -> LN) as in
    lib/transformer_wk.py:20-30; decoder layer with LN only after attention
    (lib/transformer_wk.py:49-58).
  * MaskedBatchNorm reproduces torch BatchNorm over only the *valid* rows, so
    padding can never pollute batch statistics (the reference has no padding
    at norm boundaries; masking restores that exactly).
"""

from __future__ import annotations

import functools
from functools import partial
from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30


class _DenseParams(nn.Module):
    """kernel+bias with nn.Dense's exact param tree/inits, math left to the
    caller (so q/k/v kernels can be fused into one matmul)."""

    features: int

    @nn.compact
    def __call__(self, in_dim: int) -> tuple[jnp.ndarray, jnp.ndarray]:
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (in_dim, self.features))
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return kernel, bias


class MaskedMHA(nn.Module):
    """Torch-parity multi-head attention with an explicit (Q, K) allow mask.

    `fused=True` routes mask + softmax + probability-dropout + both
    attention dots through the Pallas kernel (ops/pallas_attention.py):
    probabilities never touch HBM, the backward recomputes them from a
    stored log-sum-exp, and the un-lane-aligned head transposes disappear.
    Same semantics; dropout draws from the TPU PRNG instead of flax's
    stream (training is stochastic either way)."""

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype | None = None
    fused: bool = False

    @nn.compact
    def __call__(self, q_in: jnp.ndarray, k_in: jnp.ndarray, v_in: jnp.ndarray,
                 allow: jnp.ndarray, deterministic: bool = True,
                 dup2_pos: jnp.ndarray | None = None) -> jnp.ndarray:
        E, H = self.embed_dim, self.num_heads
        D = E // H
        wq, bq = _DenseParams(E, name="q_proj")(q_in.shape[-1])
        wk, bk = _DenseParams(E, name="k_proj")(k_in.shape[-1])
        wv, bv = _DenseParams(E, name="v_proj")(v_in.shape[-1])

        def cast(a):
            return a.astype(self.dtype) if self.dtype is not None else a

        def dense(x, pieces):
            ws, bs = zip(*pieces)
            out = cast(x) @ cast(jnp.concatenate(ws, axis=-1)) \
                + cast(jnp.concatenate(bs, axis=-1))
            return jnp.split(out, len(pieces), axis=-1)

        # fuse projections sharing an input into ONE wide matmul: the input
        # streams from HBM once instead of 2-3 times, and the MXU sees a
        # larger N. Object identity (is) detects sharing at trace time; the
        # per-output-element math is unchanged.
        if dup2_pos is not None:
            # Duplicated-stream fast path: q_in/k_in/v_in are the SAME
            # undup (..., R, E) token array x, and the logical inputs are
            #   q = k = [x + P[0]; x + P[1]],  v = [x; x]
            # with P = dup2_pos the (2, E) position pair. Projection is
            # affine, so (x+P[s])W + b == (xW + b) + P[s]W: compute the
            # x-projection ONCE (R rows instead of 2R) and broadcast-add the
            # 2-row position projection — exact same outputs, half the q/k/v
            # projection FLOPs for the first temporal-decoder layer.
            assert q_in is k_in and k_in is v_in
            xq, xk, xv = dense(q_in, [(wq, bq), (wk, bk), (wv, bv)])
            pq = cast(dup2_pos) @ cast(wq)
            pk = cast(dup2_pos) @ cast(wk)
            cat = partial(jnp.concatenate, axis=-2)
            q = cat([xq + pq[..., 0:1, :], xq + pq[..., 1:2, :]])
            k = cat([xk + pk[..., 0:1, :], xk + pk[..., 1:2, :]])
            v = cat([xv, xv])
        elif q_in is k_in and k_in is v_in:
            q, k, v = dense(q_in, [(wq, bq), (wk, bk), (wv, bv)])
        elif q_in is k_in:
            q, k = dense(q_in, [(wq, bq), (wk, bk)])
            (v,) = dense(v_in, [(wv, bv)])
        else:
            (q,) = dense(q_in, [(wq, bq)])
            (k,) = dense(k_in, [(wk, bk)])
            (v,) = dense(v_in, [(wv, bv)])

        if self.fused:
            from ..ops.pallas_attention import fused_masked_mha

            D_pad = -(-D // 128) * 128
            if self.dropout > 0.0 and not deterministic:
                key = self.make_rng("dropout")
                seeds = jax.random.bits(
                    key, allow.shape[:-2] + (1,), jnp.uint32).astype(jnp.int32)
            else:
                seeds = jnp.zeros(allow.shape[:-2] + (1,), jnp.int32)

            def headpad(x):  # (..., L, E) -> (..., L, H, D_pad), zero lanes
                x4 = x.reshape(*x.shape[:-1], H, D)
                return jnp.pad(x4, ((0, 0),) * (x4.ndim - 1)
                               + ((0, D_pad - D),))

            bias = jnp.where(allow, 0.0, NEG_INF).astype(jnp.float32)
            call = functools.partial(
                fused_masked_mha, sm_scale=1.0 / float(np.sqrt(D)),
                dropout_rate=self.dropout, deterministic=deterministic)
            for _ in range(q.ndim - 2):  # leading batch dims, if any
                call = jax.vmap(call)
            out = call(headpad(q), headpad(k), headpad(v), bias, seeds)
            out = out[..., :D].reshape(*q.shape[:-1], E)
            return nn.Dense(E, name="out_proj", dtype=self.dtype)(out)

        def split(x):  # (..., L, E) -> (..., L, H, D); head axis stays where
            # the row-major reshape puts it — the einsums below carry h as a
            # batch dim, letting XLA pick the layout instead of paying an
            # explicit (..., H, L, D) transpose per projection. (An explicit
            # head-major variant was A/B'd on the b64 bf16 train step:
            # 81.8 vs 82.0 ms — a wash; XLA already picks good layouts here.)
            return x.reshape(*x.shape[:-1], H, D)

        q, k, v = split(q), split(k), split(v)
        logits = jnp.einsum("...qhd,...khd->...hqk", q, k) / jnp.sqrt(D).astype(q.dtype)
        logits = jnp.where(allow[..., None, :, :], logits, NEG_INF)
        probs = nn.softmax(logits, axis=-1)
        # rows with zero allowed keys produce uniform garbage; zero them out
        any_key = allow.any(axis=-1)[..., None, :, None]
        probs = jnp.where(any_key, probs, 0.0)
        probs = nn.Dropout(self.dropout)(probs, deterministic=deterministic)
        out = jnp.einsum("...hqk,...khd->...qhd", probs, v)
        out = out.reshape(*out.shape[:-2], E)
        return nn.Dense(E, name="out_proj", dtype=self.dtype)(out)


class MaskedEncoderLayer(nn.Module):
    """Post-norm encoder layer (lib/transformer_wk.py:5-30)."""

    embed_dim: int
    num_heads: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    dtype: jnp.dtype | None = None
    fused: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, allow: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        attn = MaskedMHA(self.embed_dim, self.num_heads, self.dropout,
                         dtype=self.dtype, fused=self.fused,
                         name="self_attn")(
            x, x, x, allow, deterministic)
        x = x + nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        x = nn.LayerNorm(name="norm1", dtype=self.dtype)(x)
        h = nn.Dense(self.dim_feedforward, name="linear1", dtype=self.dtype)(x)
        h = nn.Dropout(self.dropout)(nn.relu(h), deterministic=deterministic)
        h = nn.Dense(self.embed_dim, name="linear2", dtype=self.dtype)(h)
        x = x + nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.LayerNorm(name="norm2", dtype=self.dtype)(x)


class MaskedDecoderLayer(nn.Module):
    """Windowed temporal layer: q/k carry position embeds, LN after attention
    only (lib/transformer_wk.py:33-58).

    `kv`/`pos_kv` let the key/value token set differ from the query rows
    (rectangular `allow` (Q, K)): the last decoder layer of the 'latter'
    fusion only ever needs its R output rows as queries while attending over
    all 2R stream tokens — per-row math is identical to the square form.

    `dup2=True` is the first-temporal-layer fast path: `x` is the UNDUP
    (..., R, E) spatial-encoder output whose former/latter streams are
    identical rows, and `pos` is the raw (2, E) slot-embedding pair; the
    layer returns the (..., 2R, E) duplicated-stream output with exactly the
    square-form math but the q/k/v projections computed once per relation
    (see MaskedMHA dup2_pos).
    """

    embed_dim: int
    num_heads: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    dtype: jnp.dtype | None = None
    fused: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, pos: jnp.ndarray, allow: jnp.ndarray,
                 deterministic: bool = True, kv: jnp.ndarray | None = None,
                 pos_kv: jnp.ndarray | None = None,
                 dup2: bool = False) -> jnp.ndarray:
        if dup2:
            attn = MaskedMHA(self.embed_dim, self.num_heads, self.dropout,
                             dtype=self.dtype, fused=self.fused,
                             name="multihead2")(
                x, x, x, allow, deterministic, dup2_pos=pos)
            x = jnp.concatenate([x, x], axis=-2)  # residual stream, dup'd
        else:
            q_in = x + pos  # shared object when kv is None -> fused q/k proj
            k_in = q_in if kv is None else kv + pos_kv
            v_in = x if kv is None else kv
            attn = MaskedMHA(self.embed_dim, self.num_heads, self.dropout,
                             dtype=self.dtype, fused=self.fused,
                             name="multihead2")(
                q_in, k_in, v_in, allow, deterministic)
        x = x + nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        x = nn.LayerNorm(name="norm3", dtype=self.dtype)(x)
        h = nn.Dense(self.dim_feedforward, name="linear1", dtype=self.dtype)(x)
        h = nn.Dropout(self.dropout)(nn.relu(h), deterministic=deterministic)
        h = nn.Dense(self.embed_dim, name="linear2", dtype=self.dtype)(h)
        return x + nn.Dropout(self.dropout)(h, deterministic=deterministic)


class TorchEncoderLayer(nn.Module):
    """torch.nn.TransformerEncoderLayer (post-norm, relu) with an allow mask —
    the building block of DSG-DETR (lib/dsg_detr.py:21-22, 109, 502-506)."""

    embed_dim: int
    num_heads: int
    dim_feedforward: int
    dropout: float = 0.1
    dtype: jnp.dtype | None = None
    fused: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, allow: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        attn = MaskedMHA(self.embed_dim, self.num_heads, self.dropout,
                         dtype=self.dtype, fused=self.fused,
                         name="self_attn")(
            x, x, x, allow, deterministic)
        x = x + nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        x = nn.LayerNorm(name="norm1", dtype=self.dtype)(x)
        h = nn.Dense(self.dim_feedforward, name="linear1", dtype=self.dtype)(x)
        h = nn.Dropout(self.dropout)(nn.relu(h), deterministic=deterministic)
        h = nn.Dense(self.embed_dim, name="linear2", dtype=self.dtype)(h)
        x = x + nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.LayerNorm(name="norm2", dtype=self.dtype)(x)


# Trace-time switch for the hand-derived MaskedBatchNorm backward, so A/B
# probes can build both variants in one process (tools/probe_bn_bwd.py).
MBN_CUSTOM_VJP = True


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _masked_bn_core(eps, x, m, count, scale, bias):
    """Masked-BN training normalization with a hand-fused backward.

    Forward math is identical to the two-pass formulation in
    MaskedBatchNorm.__call__ (fp32 statistics, biased var, output cast to
    x.dtype). The autodiff backward of that formulation re-walks the mean
    pass, the var pass, and the normalize separately (~6 HBM passes over x
    and dy); the hand derivation below needs the classic two reductions
    (sum dy, sum dy*(x-mean)) over ONE fused read plus one elementwise pass
    — the measured structural lever on the train step's BN-backward
    reduce_sum share (BASELINE.md train-step attribution, bwd
    spatial_conv/bn reduce_sum rows).
    """
    out, mean, var, _ = _mbn_forward_math(eps, x, m, count, scale, bias)
    return out, mean, var


def _mbn_forward_math(eps, x, m, count, scale, bias):
    red = tuple(range(x.ndim - 1))
    xf = x.astype(jnp.float32)
    mean = (xf * m).sum(axis=red) / count
    var = (((xf - mean) ** 2) * m).sum(axis=red) / count  # biased
    rstd = 1.0 / jnp.sqrt(var + eps)
    out = (scale * (xf - mean) * rstd + bias).astype(x.dtype)
    return out, mean, var, rstd


def _mbn_fwd(eps, x, m, count, scale, bias):
    out, mean, var, rstd = _mbn_forward_math(eps, x, m, count, scale, bias)
    return (out, mean, var), (x, m, count, scale, mean, rstd)


def _mbn_bwd(eps, res, cts):
    x, m, count, scale, mean, rstd = res
    dy, dmean_ct, dvar_ct = cts
    red = tuple(range(x.ndim - 1))
    xf = x.astype(jnp.float32)
    dyf = dy.astype(jnp.float32)
    xc = xf - mean
    # two reductions over one fused read of (dy, x)
    sum_dy = dyf.sum(axis=red)                       # (C,)
    sum_dyx = (dyf * xc).sum(axis=red)               # (C,)
    # out is produced at EVERY position (invalid rows are normalized too,
    # downstream masks them), so the direct-path sums run unmasked; only
    # the mean/var paths carry the mask, and sum(m*(x-mean)) == 0 kills
    # the var->mean cross term
    dvar = -0.5 * (sum_dyx * scale) * rstd ** 3 + dvar_ct
    dmean = -(sum_dy * scale) * rstd + dmean_ct
    dxf = dyf * (scale * rstd) + m * (2.0 * dvar * xc + dmean) / count
    return (dxf.astype(x.dtype), jnp.zeros_like(m), jnp.zeros_like(count),
            sum_dyx * rstd, sum_dy)


_masked_bn_core.defvjp(_mbn_fwd, _mbn_bwd)


class MaskedBatchNorm(nn.Module):
    """BatchNorm over valid rows only; torch-compatible running stats.

    Normalizes over all axes except the last (features); `mask` marks valid
    rows. With `use_running_average=True` behaves like torch eval mode.
    """

    momentum: float = 0.1
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray,
                 use_running_average: bool = False) -> jnp.ndarray:
        C = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(C))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(C))
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
            out = scale * (x.astype(jnp.float32) - mean) \
                * (1.0 / jnp.sqrt(var + self.epsilon)) + bias
            # normalize in fp32, return in the caller's compute dtype: a
            # bf16 tower (SpatialMaskConv) otherwise round-trips its
            # maxpool and the following conv through fp32 at 2x the HBM
            # traffic; fp32 callers are unchanged. Rounding is monotonic,
            # so e.g. max-pool over the bf16 output equals the bf16 cast
            # of the fp32 max-pool.
            return out.astype(x.dtype)

        # statistics in fp32 regardless of the compute dtype (like flax's
        # BatchNorm): summing ~1e4 bf16 elements loses ~1e-2 per channel
        # and would pollute the fp32 running buffers
        m = mask.astype(jnp.float32)
        while m.ndim < x.ndim:
            m = m[..., None]
        # count VALID POSITIONS, not valid rows: for (N, H, W, C) inputs
        # torch BatchNorm2d normalizes over N*H*W per channel, so the
        # denominator must include the spatial dims the row mask
        # broadcasts over
        count = jnp.maximum(
            jnp.broadcast_to(m, x.shape[:-1] + (1,)).sum(), 1.0)
        # two-pass mean/var in fp32 (golden vs torch), hand-fused backward
        # (_masked_bn_core). Measured dead ends for the FORWARD (don't
        # retry): (1) one-pass E[x^2]-E[x]^2 via variadic lax.reduce — its
        # autodiff rules emit reshape/slice/add_any chains costing 4x the
        # upcast (tools/probe_trace.py); (2) for bf16 inputs, an MXU Gram
        # pass over [x*m | m] (exact fp32 accumulation of bf16 products,
        # count/sum/sumsq in one dot) — the concat materializes a second
        # copy of x, C+1=129 pads a full extra lane tile, and the Gram's
        # backward matmul costs more than the saved fp32 upcast: 82.0 ->
        # 95.1 ms on the b64 bf16 train step (tools/bench_suite.py --only
        # train_step_bf16, same-session A/B).
        if MBN_CUSTOM_VJP:
            out, mean, var = _masked_bn_core(self.epsilon, x, m, count,
                                             scale, bias)
        else:  # autodiff reference path, kept for parity/probe A/B
            out, mean, var, _ = _mbn_forward_math(self.epsilon, x, m,
                                                  count, scale, bias)
        if not self.is_initializing():
            unbiased = var * count / jnp.maximum(count - 1.0, 1.0)
            ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
            ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        return out


def sinusoidal_position_table(max_len: int, d_model: int) -> jnp.ndarray:
    """DETR-style sinusoidal table (lib/dsg_detr.py:25-36)."""
    position = jnp.arange(max_len)[:, None].astype(jnp.float32)
    div = jnp.exp(jnp.arange(0, d_model, 2).astype(jnp.float32)
                  * (-jnp.log(10000.0) / d_model))
    pe = jnp.zeros((max_len, d_model))
    pe = pe.at[:, 0::2].set(jnp.sin(position * div))
    pe = pe.at[:, 1::2].set(jnp.cos(position * div))
    return pe


def mlp(features: list[int], activation: Callable = nn.relu) -> nn.Module:
    """Simple FFN used by DSG-DETR heads (lib/dsg_detr.py:66-78)."""

    class _MLP(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i, f in enumerate(features):
                x = nn.Dense(f)(x)
                if i < len(features) - 1:
                    x = activation(x)
            return x

    return _MLP()

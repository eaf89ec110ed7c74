"""Parity: the fused Pallas masked-MHA kernel vs the plain jnp formulation
(models/layers.py::MaskedMHA semantics) — forward and gradients, square and
rectangular, including rows with no allowed keys, under vmap.

Runs the Pallas interpreter (CPU); on-chip numerics are the same program
with MXU accumulation. Dropout paths need the TPU PRNG and are exercised by
the on-chip integration (tools/probe_train_mfu.py) rather than here.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nl_vsgg_tpu.ops.pallas_attention import NEG_INF, fused_masked_mha

H, D, DP = 4, 30, 128  # padded head dim (lane multiple)


def ref_mha(q, k, v, allow, scale):
    logits = jnp.einsum("qhd,khd->hqk", q, k) * scale
    logits = jnp.where(allow[None], logits, NEG_INF)
    p = jax.nn.softmax(logits, axis=-1)
    p = jnp.where(allow.any(-1)[None, :, None], p, 0.0)
    return jnp.einsum("hqk,khd->qhd", p, v)


def pad(x):
    return jnp.pad(x, ((0, 0), (0, 0), (0, DP - D)))


def make(rng, lq, lk, dense_rows=True):
    q = jnp.asarray(rng.standard_normal((lq, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((lk, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((lk, H, D)), jnp.float32)
    allow = jnp.asarray(rng.random((lq, lk)) < 0.6)
    if not dense_rows:
        allow = allow.at[1].set(False)  # a row with zero allowed keys
    return q, k, v, allow


@pytest.mark.parametrize("lq,lk", [(16, 16), (8, 24)])
@pytest.mark.parametrize("dense_rows", [True, False])
def test_forward_parity(lq, lk, dense_rows):
    rng = np.random.default_rng(0)
    q, k, v, allow = make(rng, lq, lk, dense_rows)
    scale = 1.0 / np.sqrt(D)
    bias = jnp.where(allow, 0.0, NEG_INF).astype(jnp.float32)
    seed = jnp.zeros((1,), jnp.int32)
    out = fused_masked_mha(pad(q), pad(k), pad(v), bias, seed,
                           sm_scale=scale, interpret=True)
    np.testing.assert_allclose(np.asarray(out[..., :D]),
                               np.asarray(ref_mha(q, k, v, allow, scale)),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(out[..., D:]), 0.0)


def test_grad_parity_vmapped():
    rng = np.random.default_rng(1)
    B, lq, lk = 3, 12, 12
    packs = [make(rng, lq, lk, dense_rows=(b != 2)) for b in range(B)]
    q = jnp.stack([p[0] for p in packs])
    k = jnp.stack([p[1] for p in packs])
    v = jnp.stack([p[2] for p in packs])
    allow = jnp.stack([p[3] for p in packs])
    scale = 1.0 / np.sqrt(D)
    bias = jnp.where(allow, 0.0, NEG_INF).astype(jnp.float32)
    seeds = jnp.zeros((B, 1), jnp.int32)
    w = jnp.asarray(rng.standard_normal((H, D)), jnp.float32)  # loss weights

    def loss_fused(q, k, v):
        out = jax.vmap(lambda a, b, c, bi, s: fused_masked_mha(
            a, b, c, bi, s, sm_scale=scale, interpret=True))(
                pad(q.reshape(-1, H, D)).reshape(B, lq, H, DP),
                pad(k.reshape(-1, H, D)).reshape(B, lk, H, DP),
                pad(v.reshape(-1, H, D)).reshape(B, lk, H, DP),
                bias, seeds)
        return jnp.sum(out[..., :D] * w)

    def loss_ref(q, k, v):
        out = jax.vmap(lambda a, b, c, al: ref_mha(a, b, c, al, scale))(
            q, k, v, allow)
        return jnp.sum(out * w)

    np.testing.assert_allclose(float(loss_fused(q, k, v)),
                               float(loss_ref(q, k, v)), rtol=1e-5)
    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


class TestFusedModuleParity:
    """MaskedMHA(fused=True) and the full STTranTransformer must match the
    XLA formulation on the SAME params — forward and parameter gradients.
    Uses the Pallas interpreter (CPU conftest)."""

    def test_masked_mha_fused_vs_plain(self):
        from nl_vsgg_tpu.models.layers import MaskedMHA

        rng = np.random.default_rng(7)
        E_, H_, L = 48, 4, 10
        x = jnp.asarray(rng.standard_normal((L, E_)), jnp.float32)
        kv = jnp.asarray(rng.standard_normal((7, E_)), jnp.float32)
        allow = jnp.asarray(rng.random((L, 7)) < 0.5)
        allow = allow.at[3].set(False)  # a row with no allowed keys
        plain = MaskedMHA(E_, H_, dropout=0.0)
        fused = MaskedMHA(E_, H_, dropout=0.0, fused=True)
        params = plain.init(jax.random.PRNGKey(0), x, kv, kv, allow)

        def loss(p, m):
            return jnp.sum(m.apply(p, x, kv, kv, allow) ** 2)

        np.testing.assert_allclose(float(loss(params, fused)),
                                   float(loss(params, plain)), rtol=1e-5)
        gf = jax.grad(loss)(params, fused)
        gp = jax.grad(loss)(params, plain)
        flat_f = jax.tree_util.tree_leaves_with_path(gf)
        flat_p = dict(jax.tree_util.tree_leaves_with_path(gp))
        for path, leaf in flat_f:
            np.testing.assert_allclose(np.asarray(leaf),
                                       np.asarray(flat_p[path]),
                                       rtol=5e-4, atol=1e-5,
                                       err_msg=str(path))

    def test_sttran_transformer_fused_vs_plain(self):
        from nl_vsgg_tpu.models.sttran import STTranTransformer

        rng = np.random.default_rng(8)
        E_, H_, R = 32, 2, 8
        feats = jnp.asarray(rng.standard_normal((R, E_)), jnp.float32)
        im_idx = jnp.asarray([0, 0, 1, 1, 2, 2, 0, 0], jnp.int32)
        mask = jnp.asarray([True] * 6 + [False] * 2)
        kw = dict(embed_dim=E_, num_heads=H_, dim_feedforward=64,
                  dropout=0.0, enc_layers=1, dec_layers=3, mode="latter")
        plain = STTranTransformer(**kw)
        fused = STTranTransformer(**kw, fused=True)
        params = plain.init(jax.random.PRNGKey(1), feats, im_idx, mask,
                            jnp.int32(3))

        def loss(p, m):
            return jnp.sum(m.apply(p, feats, im_idx, mask, jnp.int32(3)) ** 2)

        np.testing.assert_allclose(float(loss(params, fused)),
                                   float(loss(params, plain)), rtol=1e-5)
        gf = jax.tree_util.tree_leaves(jax.grad(loss)(params, fused))
        gp = jax.tree_util.tree_leaves(jax.grad(loss)(params, plain))
        for a, b in zip(gf, gp):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=2e-5)

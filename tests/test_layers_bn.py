"""MaskedBatchNorm train-mode statistics vs torch BatchNorm2d/1d.

Regression for the round-2 bug where the 4D (rows, H, W, C) form divided
spatial sums by the valid-ROW count only (a 196x mean error at 14x14), and
for bf16 inputs polluting the fp32 running buffers.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nl_vsgg_tpu.models.layers import MaskedBatchNorm

torch = pytest.importorskip("torch")


def _apply_train(x, mask, momentum=0.1):
    bn = MaskedBatchNorm(momentum=momentum)
    variables = bn.init(jax.random.key(0), x, mask)
    out, updates = bn.apply(variables, x, mask, use_running_average=False,
                            mutable=["batch_stats"])
    return np.asarray(out), {k: np.asarray(v)
                             for k, v in updates["batch_stats"].items()}


@pytest.mark.parametrize("shape", [(6, 14, 14, 5), (6, 5)])
def test_train_stats_match_torch_all_valid(shape):
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(shape) * 2.0 + 3.0).astype(np.float32)
    mask = np.ones(shape[0], bool)
    out, stats = _apply_train(jnp.asarray(x), jnp.asarray(mask))

    if len(shape) == 4:
        t = torch.nn.BatchNorm2d(shape[-1], momentum=0.1)
        tx = torch.from_numpy(np.moveaxis(x, -1, 1))  # NHWC -> NCHW
        t.train()
        ref = t(tx).detach().numpy()
        ref = np.moveaxis(ref, 1, -1)
    else:
        t = torch.nn.BatchNorm1d(shape[-1], momentum=0.1)
        t.train()
        ref = t(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(stats["mean"],
                               t.running_mean.detach().numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(stats["var"],
                               t.running_var.detach().numpy(),
                               rtol=1e-5, atol=1e-6)


def test_masked_rows_do_not_pollute_stats():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 7, 7, 3)).astype(np.float32)
    pad = np.concatenate([x, 100.0 * np.ones((2, 7, 7, 3), np.float32)])
    mask = np.array([True] * 4 + [False] * 2)
    out_small, stats_small = _apply_train(jnp.asarray(x), jnp.ones(4, bool))
    out_pad, stats_pad = _apply_train(jnp.asarray(pad), jnp.asarray(mask))
    np.testing.assert_allclose(out_pad[:4], out_small, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(stats_pad["mean"], stats_small["mean"],
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(stats_pad["var"], stats_small["var"],
                               rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_custom_vjp_matches_autodiff(monkeypatch, dtype):
    """The hand-fused backward (_masked_bn_core) must equal autodiff grads
    through the two-pass formulation — same math, different association."""
    from nl_vsgg_tpu.models import layers

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((6, 14, 14, 5)) * 2 + 1.0, dtype)
    mask = jnp.asarray([True, True, True, True, False, False])
    w = jnp.asarray(rng.standard_normal(x.shape), jnp.float32)

    def run(custom):
        monkeypatch.setattr(layers, "MBN_CUSTOM_VJP", custom)
        bn = MaskedBatchNorm(momentum=0.1)
        variables = bn.init(jax.random.key(0), x, mask)
        params = {
            "scale": jnp.asarray(rng.standard_normal(5), jnp.float32),
            "bias": jnp.asarray(rng.standard_normal(5), jnp.float32),
        }

        def loss(params, x):
            out, upd = bn.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                x, mask, use_running_average=False,
                mutable=["batch_stats"])
            return (out.astype(jnp.float32) * w).sum(), upd["batch_stats"]

        (val, upd), grads = jax.value_and_grad(loss, argnums=(0, 1),
                                               has_aux=True)(params, x)
        return val, upd, grads

    # same rng stream for both: re-seed
    rng = np.random.default_rng(3)
    _ = rng.standard_normal((6, 14, 14, 5)), rng.standard_normal(x.shape)
    v1, u1, g1 = run(custom=True)
    rng = np.random.default_rng(3)
    _ = rng.standard_normal((6, 14, 14, 5)), rng.standard_normal(x.shape)
    v2, u2, g2 = run(custom=False)

    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree.leaves((u1, g1)), jax.tree.leaves((u2, g2))):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=2e-4, atol=2e-4)


def test_bf16_input_keeps_fp32_stats():
    rng = np.random.default_rng(2)
    x = (rng.standard_normal((16, 14, 14, 4)) + 2.0).astype(np.float32)
    out32, stats32 = _apply_train(jnp.asarray(x), jnp.ones(16, bool))
    out16, stats16 = _apply_train(jnp.asarray(x, jnp.bfloat16),
                                  jnp.ones(16, bool))
    assert stats16["mean"].dtype == np.float32
    # bf16 INPUT rounding (~3e-3 relative) is fine; bf16 ACCUMULATION over
    # 14*14*16 elements (~1e-1) is what the fp32-stats path prevents
    np.testing.assert_allclose(stats16["mean"], stats32["mean"],
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(out16, out32, rtol=5e-2, atol=5e-2)

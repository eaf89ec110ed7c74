"""Pallas grouped-conv parity vs lax.conv_general_dilated (interpret mode).

Covers every ResNeXt-152 32x8d stride-1 conv2 geometry class (c per group in
{8, 16, 32, 64}; detector/resnet.py stages 2-5) at reduced spatial sizes,
fp32 and bf16, plus the tiling edge cases (N not filling one tile, C equal
to one block, multi-block C).
"""

import numpy as np
import pytest

import jax.numpy as jnp
from jax import lax

from nl_vsgg_tpu.ops.pallas_grouped_conv import grouped_conv3x3


def _ref_conv(x, w, groups):
    return lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)


CASES = [
    # (N, H, W, C, groups)  — c = C/groups
    (2, 6, 9, 256, 32),     # stage2 geometry class: c=8, two 128-blocks
    (3, 5, 7, 512, 32),     # stage3: c=16
    (2, 7, 10, 1024, 32),   # stage4: c=32
    (4, 7, 7, 2048, 32),    # stage5 on roi crops: c=64
    (1, 4, 5, 128, 16),     # C == one block, N == one tile
    (5, 3, 4, 256, 2),      # c == block_c (no packing, lg=1)
]


def test_row_chunked_parity(rng, monkeypatch):
    """Tall maps split into halo'd row chunks must match exactly, including
    the chunk-boundary rows and a ragged last chunk."""
    import nl_vsgg_tpu.ops.pallas_grouped_conv as m
    monkeypatch.setattr(m, "_VMEM_BUDGET", 220 * 1024)  # force tiny chunks
    x = jnp.asarray(rng.standard_normal((2, 13, 6, 128)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 128)) * 0.1, jnp.float32)
    tn, hc = m._pick_tiles(2, 13, 6, 128, 4)
    assert tn == 1 and 1 <= hc < 13 and 13 % hc != 0  # ragged final chunk
    got = m.grouped_conv3x3(x, w, 16, interpret=True)
    ref = _ref_conv(x, w, 16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_bias_relu_epilogue(rng):
    x = jnp.asarray(rng.standard_normal((1, 5, 6, 256)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 256)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(256), jnp.float32)
    ref = jnp.maximum(_ref_conv(x, w, 32) + bias, 0.0)
    got = grouped_conv3x3(x, w, 32, bias, relu=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("N,H,W,C,groups", CASES)
def test_fp32_parity(rng, N, H, W, C, groups):
    c = C // groups
    x = jnp.asarray(rng.standard_normal((N, H, W, C)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, c, C)) * 0.1, jnp.float32)
    ref = _ref_conv(x, w, groups)
    got = grouped_conv3x3(x, w, groups, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_bf16_parity(rng):
    N, H, W, C, groups = 2, 6, 8, 512, 32
    x = jnp.asarray(rng.standard_normal((N, H, W, C)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, 16, C)) * 0.1, jnp.bfloat16)
    # fp32 accumulation in both paths: compare against the fp32 reference of
    # the same bf16 inputs, at bf16 output resolution
    ref = _ref_conv(x.astype(jnp.float32), w.astype(jnp.float32), groups)
    got = grouped_conv3x3(x, w, groups, interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(ref),
                               rtol=0.02, atol=0.02)


def test_out_dtype_and_shape(rng):
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 128)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, 4, 128)) * 0.1, jnp.bfloat16)
    got = grouped_conv3x3(x, w, 32, out_dtype=jnp.float32, interpret=True)
    assert got.shape == (2, 4, 4, 128) and got.dtype == jnp.float32


def test_rejects_packed_kernel(rng):
    x = jnp.zeros((1, 4, 4, 256), jnp.float32)
    w_packed = jnp.zeros((3, 3, 64, 256), jnp.float32)  # eff4-packed shape
    with pytest.raises(ValueError, match="unpacked kernel"):
        grouped_conv3x3(x, w_packed, 32, interpret=True)

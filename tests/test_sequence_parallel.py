"""Frame-axis sequence parallelism: sharded windowed attention with 1-frame
halo exchange must equal the dense computation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from nl_vsgg_tpu.parallel.sequence import (windowed_attention_reference,
                                           windowed_attention_sharded)


def _setup(rng, F=16, L=4, D=32):
    tokens = jnp.asarray(rng.standard_normal((F, L, D)).astype(np.float32))
    valid = jnp.asarray(rng.uniform(size=(F, L)) > 0.3)
    # make one frame fully empty (masking path)
    valid = valid.at[5].set(False)
    params = {k: {"kernel": jnp.asarray(rng.standard_normal((D, D)).astype(np.float32) * 0.1),
                  "bias": jnp.zeros(D)} for k in "qkvo"}
    pos = jnp.asarray(rng.standard_normal((2, D)).astype(np.float32) * 0.1)
    return tokens, valid, params, pos


def test_sharded_matches_dense(rng):
    devices = jax.devices()
    assert len(devices) == 8
    mesh = Mesh(np.asarray(devices).reshape(8, 1), ("data", "model"))
    tokens, valid, params, pos = _setup(rng)
    dense = windowed_attention_reference(tokens, valid, params, pos, num_heads=4)
    sharded = windowed_attention_sharded(mesh)(tokens, valid, params, pos,
                                               num_heads=4)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(dense),
                               atol=2e-5)


def test_dense_reference_semantics(rng):
    """Frame f attends only over frames f-1 and f: changing frame f+1 must
    not change frame f's output (f >= 1)."""
    tokens, valid, params, pos = _setup(rng, F=6)
    out1 = windowed_attention_reference(tokens, valid, params, pos, num_heads=4)
    tokens2 = tokens.at[4].add(10.0)
    out2 = windowed_attention_reference(tokens2, valid, params, pos, num_heads=4)
    np.testing.assert_allclose(np.asarray(out1[:3]), np.asarray(out2[:3]), atol=1e-6)
    assert np.abs(np.asarray(out1[4]) - np.asarray(out2[4])).max() > 1e-3

"""Sharded-vs-dense parity of the PRODUCTION STTranTransformer under frame
sharding (parallel/sttran_sp.py) on the 8-device CPU mesh, using the real
module's initialized weights — not the standalone demo op."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nl_vsgg_tpu.models.sttran import STTranTransformer
from nl_vsgg_tpu.parallel.mesh import make_mesh
from nl_vsgg_tpu.parallel.sttran_sp import (grid_to_rel, rel_to_grid,
                                            sttran_transformer_sharded)

D, HEADS, FF = 64, 4, 128
F_MAX, SLOTS = 8, 12


def _tokens(rng, R=48, n_frames=8):
    im_idx = np.sort(rng.integers(0, n_frames, R)).astype(np.int32)
    rel_mask = rng.uniform(size=R) > 0.2
    im_idx = np.where(rel_mask, im_idx, 0).astype(np.int32)
    feats = rng.standard_normal((R, D)).astype(np.float32)
    feats[~rel_mask] = 0.0
    return (jnp.asarray(feats), jnp.asarray(im_idx), jnp.asarray(rel_mask))


def _model_and_params(feats, im_idx, rel_mask, num_frames, enc=1, dec=2):
    model = STTranTransformer(embed_dim=D, num_heads=HEADS, dim_feedforward=FF,
                              enc_layers=enc, dec_layers=dec, mode="latter")
    variables = model.init(jax.random.key(0), feats, im_idx, rel_mask,
                           jnp.int32(num_frames))
    return model, variables


def test_grid_roundtrip(rng):
    feats, im_idx, rel_mask = _tokens(rng)
    grid, valid, gather = rel_to_grid(feats, im_idx, rel_mask, F_MAX, SLOTS)
    assert int(valid.sum()) == int(rel_mask.sum())
    back = grid_to_rel(grid, gather, rel_mask)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(feats))


@pytest.mark.parametrize("num_frames", [8, 5])
def test_sharded_matches_dense(rng, num_frames):
    assert len(jax.devices()) == 8
    mesh = make_mesh(data=4, model=2)
    feats, im_idx, rel_mask = _tokens(rng, n_frames=num_frames)
    model, variables = _model_and_params(feats, im_idx, rel_mask, num_frames)
    dense = model.apply(variables, feats, im_idx, rel_mask, jnp.int32(num_frames))
    with mesh:
        sharded = sttran_transformer_sharded(
            mesh, variables["params"], feats, im_idx, rel_mask,
            jnp.int32(num_frames), n_frames_max=F_MAX, slots=SLOTS,
            num_heads=HEADS, enc_layers=1, dec_layers=2)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(dense),
                               atol=2e-5, rtol=1e-5)


def test_single_frame_passthrough(rng):
    mesh = make_mesh(data=4, model=2)
    feats, im_idx, rel_mask = _tokens(rng, n_frames=1)
    model, variables = _model_and_params(feats, im_idx, rel_mask, 1)
    dense = model.apply(variables, feats, im_idx, rel_mask, jnp.int32(1))
    with mesh:
        # all relations live in frame 0: slots must cover them all
        sharded = sttran_transformer_sharded(
            mesh, variables["params"], feats, im_idx, rel_mask,
            jnp.int32(1), n_frames_max=F_MAX, slots=feats.shape[0],
            num_heads=HEADS, enc_layers=1, dec_layers=2)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(dense),
                               atol=2e-5, rtol=1e-5)

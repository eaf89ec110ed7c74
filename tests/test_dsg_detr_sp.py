"""Sharded-vs-dense parity of the PRODUCTION DSG-DETR relation transformer
under token sharding (parallel/dsg_detr_sp.py) on the 8-device CPU mesh.

The dense side is the FULL DSGDETR forward; the sharded path consumes the
model's own sowed segment inputs (rel_features / frame_of / obj_cls /
ranks) and its trained parameters, so any drift in the production module
breaks this test — no re-derived reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nl_vsgg_tpu.data.synthetic import make_synthetic_entry
from nl_vsgg_tpu.models.dsg_detr import DSGDETR
from nl_vsgg_tpu.parallel.dsg_detr_sp import dsg_detr_transformer_sharded
from nl_vsgg_tpu.parallel.mesh import make_mesh


def _entry(rng, n_frames=4, rels=32):
    return make_synthetic_entry(rng, n_frames=n_frames, objs_per_frame=2,
                                bucket_boxes=24, bucket_rels=rels,
                                feat_dim=64)


@pytest.mark.parametrize("n_frames", [4, 2])
def test_token_sharded_matches_dense(rng, n_frames):
    assert len(jax.devices()) == 8
    mesh = make_mesh(data=4, model=2)
    e = _entry(rng, n_frames=n_frames)
    model = DSGDETR(mode="sgdet", feat_dim=64)
    variables = model.init({"params": jax.random.key(0),
                            "dropout": jax.random.key(1)}, e, train=False)
    out, inter = model.apply(variables, e, train=False,
                             mutable=["intermediates"])
    taps = inter["intermediates"]
    dense = np.asarray(out["global_output"])
    with mesh:
        sharded = dsg_detr_transformer_sharded(
            mesh, variables["params"],
            taps["rel_features"][0].astype(jnp.float32),
            taps["frame_of"][0].astype(jnp.int32),
            taps["obj_cls"][0].astype(jnp.int32),
            taps["ranks"][0].astype(jnp.int32),
            jnp.asarray(e.rel_mask),
            enc_layers=model.enc_layer_num, dec_layers=model.dec_layer_num)
    np.testing.assert_allclose(np.asarray(sharded), dense,
                               atol=2e-5, rtol=1e-5)


def test_token_sharded_rejects_unaligned_bucket(rng):
    mesh = make_mesh(data=4, model=2)
    e = _entry(rng, rels=30)  # 30 % 4 != 0
    model = DSGDETR(mode="sgdet", feat_dim=64)
    variables = model.init({"params": jax.random.key(0),
                            "dropout": jax.random.key(1)}, e, train=False)
    _, inter = model.apply(variables, e, train=False,
                           mutable=["intermediates"])
    taps = inter["intermediates"]
    with pytest.raises(AssertionError):
        with mesh:
            dsg_detr_transformer_sharded(
                mesh, variables["params"],
                taps["rel_features"][0], taps["frame_of"][0],
                taps["obj_cls"][0], taps["ranks"][0],
                jnp.asarray(e.rel_mask),
                enc_layers=model.enc_layer_num,
                dec_layers=model.dec_layer_num)

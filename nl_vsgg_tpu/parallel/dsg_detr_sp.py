"""Token-axis sequence parallelism for the PRODUCTION DSG-DETR relation
transformer (VERDICT r3 #5 — the second model family's sharding story).

Why not frame sharding. STTran's temporal decoder attends inside 2-frame
windows, so a frame partition needs only a 1-row halo per layer
(parallel/sttran_sp.py). DSG-DETR's temporal attention instead groups
relation tokens by OBJECT CLASS across the WHOLE video
(lib/dsg_detr.py:545-564): a class tracklet typically spans every frame
(AG objects persist — the person row is in ~all frames), so any frame
partition cuts ~every tracklet and the halo becomes the full sequence.

Design. Shard the flat relation/token axis R over the mesh axis. Per
encoder layer: Q / K / V are projected LOCALLY (FLOPs split n ways), then
K and V are all-gathered so each device attends its local queries against
the full token set — the classic sequence-parallel attention recipe, with
the gathers riding the ICI. The allow masks (same-frame for the spatial
encoders, same-object-class for the temporal ones) are computed from one
tiny metadata all-gather reused by every layer. LayerNorms and FFNs are
token-local. Comm per layer = 2·R·E bytes (K+V); at AG scale (R=96,
E=1936, bf16) that is ~0.7 MB/layer/video — ICI noise next to the
attention+FFN FLOPs it unlocks splitting.

Numerics are models/layers.py::TorchEncoderLayer + SinusoidalPE
re-expressed functionally over the module's own trained parameters
(params["local_{i}"], params["global_{i}"] of a DSGDETR); the parity test
(tests/test_dsg_detr_sp.py) runs the FULL production model dense and this
sharded path on the model's own sowed segment inputs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models.layers import sinusoidal_position_table
from .sttran_sp import NEG_INF, _dense, _ln


def _mha_sp(p, x, kg, allow, num_heads: int, axis: str):
    """MaskedMHA with local queries and all-gathered keys/values.

    x: (Rl, E) local tokens; kg: (R, E) the gathered token set (already
    all-gathered by the caller once per layer input — see _enc_layer_sp);
    allow: (Rl, R) local-query x global-key mask.
    """
    E = x.shape[-1]
    D = E // num_heads

    def split(t):
        return jnp.moveaxis(t.reshape(*t.shape[:-1], num_heads, D), -2, -3)

    q = split(_dense(p["q_proj"], x))
    k = split(_dense(p["k_proj"], kg))
    v = split(_dense(p["v_proj"], kg))
    logits = jnp.einsum("hqd,hkd->hqk", q, k) / jnp.sqrt(D).astype(q.dtype)
    logits = jnp.where(allow[None, :, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    probs = jnp.where(allow.any(-1)[None, :, None], probs, 0.0)
    out = jnp.einsum("hqk,hkd->hqd", probs, v)
    out = jnp.moveaxis(out, -3, -2).reshape(*x.shape[:-1], E)
    return _dense(p["out_proj"], out)


def _enc_layer_sp(p, x, allow, num_heads: int, axis: str):
    """TorchEncoderLayer (post-norm relu), token-sharded.

    The K/V source is the layer INPUT all-gathered here: k/v projections
    above are applied to the gathered copy, so projection FLOPs for K/V are
    duplicated per device while the O(R²) attention and the FFN split n
    ways — at E=1936 the duplicated part is <3% of the layer.
    """
    kg = jax.lax.all_gather(x, axis, axis=0, tiled=True)
    x = _ln(p["norm1"], x + _mha_sp(p["self_attn"], x, kg, allow, num_heads,
                                    axis))
    h = _dense(p["linear2"], jax.nn.relu(_dense(p["linear1"], x)))
    return _ln(p["norm2"], x + h)


def dsg_detr_transformer_sharded(mesh: Mesh, params, rel_features, frame_of,
                                 obj_cls, ranks, rel_mask, *,
                                 enc_layers: int, dec_layers: int,
                                 num_heads: int = 8, max_len: int = 400,
                                 axis: str = "data") -> jnp.ndarray:
    """Token-sharded forward of DSG-DETR's relation transformer (inference).

    params: variables["params"] of a trained DSGDETR (uses the top-level
    "local_{i}" / "global_{i}" children; the sinusoidal PE is parameter-
    free). Inputs are the model's own segment inputs (sowed as
    "intermediates" by models/dsg_detr.py): rel_features (R, E) fp32,
    frame_of / obj_cls / ranks (R,) int32, rel_mask (R,) bool. R must be a
    multiple of mesh.shape[axis] (relation buckets are, configs/). Returns
    (R, E) fp32 equal to the dense model's `global_output`.
    """
    n = mesh.shape[axis]
    R = rel_features.shape[0]
    assert R % n == 0, (R, n)
    pe_table = sinusoidal_position_table(max_len, rel_features.shape[-1])

    def shard_fn(x, fo, oc, rk, m):
        # one tiny metadata gather, reused by every layer's allow mask
        fo_g = jax.lax.all_gather(fo, axis, axis=0, tiled=True)
        oc_g = jax.lax.all_gather(oc, axis, axis=0, tiled=True)
        m_g = jax.lax.all_gather(m, axis, axis=0, tiled=True)

        # ---- spatial encoders: same-frame attention (:536-543) ----
        allow_s = (fo[:, None] == fo_g[None, :]) & m[:, None] & m_g[None, :]
        for i in range(enc_layers):
            x = _enc_layer_sp(params[f"local_{i}"], x, allow_s, num_heads,
                              axis)
        x = jnp.where(m[:, None], x, 0.0)

        # ---- sinusoidal PE over tracklet ranks (:26-48, :545-560) ----
        x = x + pe_table[jnp.clip(rk, 0, max_len - 1)]

        # ---- temporal encoders: same-object-class attention (:545-564) ----
        allow_t = (oc[:, None] == oc_g[None, :]) & m[:, None] & m_g[None, :]
        for i in range(dec_layers):
            x = _enc_layer_sp(params[f"global_{i}"], x, allow_t, num_heads,
                              axis)
        return jnp.where(m[:, None], x, 0.0).astype(jnp.float32)

    return jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis))(rel_features, frame_of, obj_cls, ranks, rel_mask)

"""Frame-axis sequence parallelism for the PRODUCTION STTranTransformer.

Runs the real module's spatial encoder + windowed temporal decoder with the
video's frame axis sharded over a mesh axis, consuming the module's own
trained parameters (params["glocal_transformer"]) — not a demo re-derivation.

Layout transform. STTran's tokens are relation-major (R, D) with a frame id
per token (models/sttran.py). For frame sharding they are scattered into a
frame-major grid (F, L, D) (L = max relations/frame) plus a validity grid;
outputs gather back to (R, D). The grid transform is exact: every consumer
masks, and the gather reads only real relation slots.

Communication. The spatial encoder attends within one frame -> fully local,
zero communication. The temporal decoder is the duplicated former/latter
stream construction of STTranTransformer: window w attends over {frame w
tokens as 'former' (slot 0), frame w+1 tokens as 'latter' (slot 1)}
(lib/transformer_wk.py:158-171 semantics). Keeping stream A (former, owned by
frame w) and stream B (latter, owned by frame w+1) as separate grids, window
w needs A[w] (local) and B[w+1] — ONE ppermute halo row per decoder layer,
plus the reverse ppermute to return B's updated halo row. No all-gather, no
ring attention: the 2-frame window makes the halo the entire communication.

Numerics are the flax modules' math re-expressed functionally (MaskedMHA /
MaskedEncoderLayer / MaskedDecoderLayer in models/layers.py); the
sharded-vs-dense parity test runs both on the same trained weights
(tests/test_sttran_sp.py).

Scope: a FORWARD (inference-path) implementation, like
parallel/dsg_detr_sp.py — "production" refers to the module/parameters it
runs, not the training step. Training parallelism is data-parallel over
videos (parallel/mesh.py; at AG scale — tens of frames, 2-frame windows —
the video axis dominates and the frame axis stays local). shard_map is
differentiable, so extending either to the backward is mechanical if a
single video ever exceeds one chip.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e30
LN_EPS = 1e-6  # flax nn.LayerNorm default, as used by models/layers.py


# ------------------------------------------------------------ functional ops
def _dense(p, x):
    return x @ p["kernel"] + p["bias"]


def _ln(p, x):
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + LN_EPS) * p["scale"] + p["bias"]


def _mha(p, q_in, k_in, v_in, allow, num_heads):
    """models/layers.py::MaskedMHA, inference (dropout off)."""
    E = q_in.shape[-1]
    D = E // num_heads

    def split(x):
        return jnp.moveaxis(x.reshape(*x.shape[:-1], num_heads, D), -2, -3)

    q = split(_dense(p["q_proj"], q_in))
    k = split(_dense(p["k_proj"], k_in))
    v = split(_dense(p["v_proj"], v_in))
    logits = jnp.einsum("...hqd,...hkd->...hqk", q, k) / jnp.sqrt(D).astype(q.dtype)
    logits = jnp.where(allow[..., None, :, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    probs = jnp.where(allow.any(-1)[..., None, :, None], probs, 0.0)
    out = jnp.einsum("...hqk,...hkd->...hqd", probs, v)
    out = jnp.moveaxis(out, -3, -2).reshape(*q_in.shape[:-1], E)
    return _dense(p["out_proj"], out)


def _enc_layer(p, x, allow, num_heads):
    """MaskedEncoderLayer: post-norm (attn-add-LN-FFN-add-LN)."""
    x = _ln(p["norm1"], x + _mha(p["self_attn"], x, x, x, allow, num_heads))
    h = _dense(p["linear2"], jax.nn.relu(_dense(p["linear1"], x)))
    return _ln(p["norm2"], x + h)


def _dec_layer(p, x, pos, allow, num_heads):
    """MaskedDecoderLayer: q/k carry pos, LN after attention only."""
    x = _ln(p["norm3"], x + _mha(p["multihead2"], x + pos, x + pos, x,
                                 allow, num_heads))
    return x + _dense(p["linear2"], jax.nn.relu(_dense(p["linear1"], x)))


# ------------------------------------------------------- layout transforms
def rel_to_grid(rel_features, im_idx, rel_mask, n_frames: int, slots: int):
    """(R, D) relation-major -> (F, L, D) frame-major + validity + gather map.

    Invalid relations are routed to a scratch frame (row F) so scatter
    collisions cannot corrupt real slots. `slots` must be >= the max number
    of valid relations in any one frame (XLA drops out-of-bounds scatter
    rows silently) — callers size it from the bucket (rels <= slots is always
    safe).
    """
    R = rel_features.shape[0]
    r = jnp.arange(R)
    same = (im_idx[None, :] == im_idx[:, None]) & rel_mask[None, :]
    pos_in_frame = (same & (r[None, :] < r[:, None])).sum(1)
    f_idx = jnp.where(rel_mask, im_idx, n_frames)
    s_idx = jnp.where(rel_mask, pos_in_frame, 0)
    grid = jnp.zeros((n_frames + 1, slots, rel_features.shape[-1]),
                     rel_features.dtype)
    grid = grid.at[f_idx, s_idx].set(
        jnp.where(rel_mask[:, None], rel_features, 0.0))
    valid = jnp.zeros((n_frames + 1, slots), bool).at[f_idx, s_idx].set(rel_mask)
    return grid[:n_frames], valid[:n_frames], (f_idx, s_idx)


def grid_to_rel(grid, gather, rel_mask):
    """Inverse of rel_to_grid for an (F, L, D) output grid."""
    f_idx, s_idx = gather
    pad = jnp.zeros((1,) + grid.shape[1:], grid.dtype)
    out = jnp.concatenate([grid, pad], 0)[f_idx, s_idx]
    return jnp.where(rel_mask[:, None], out, 0.0)


# ------------------------------------------------------------- sharded run
def sttran_transformer_sharded(mesh: Mesh, params, rel_features, im_idx,
                               rel_mask, num_frames, n_frames_max: int,
                               slots: int, num_heads: int = 8,
                               enc_layers: int = 1, dec_layers: int = 3,
                               axis: str = "data"):
    """Frame-sharded forward of STTranTransformer (inference, 'latter' fusion).

    params: variables["params"]["glocal_transformer"] of a trained STTran.
    n_frames_max must be a multiple of mesh.shape[axis]. Returns (R, D) equal
    to the dense module's output.
    """
    n = mesh.shape[axis]
    assert n_frames_max % n == 0, (n_frames_max, n)
    pe = params["position_embedding"]  # (2, D)

    grid, gvalid, gather = rel_to_grid(rel_features, im_idx, rel_mask,
                                       n_frames_max, slots)
    frame_no = jnp.arange(n_frames_max)
    # b-1 = last relation-bearing frame (lib/transformer_wk.py:135); windows
    # exist over 0..b-2 regardless of trailing relation-less frames — must
    # match models/sttran.py::STTranTransformer exactly
    f_last = jnp.max(jnp.where(rel_mask, im_idx, 0))

    def shard_fn(g, gv, fno, f_last):
        # ---- spatial encoder: same-frame attention, fully local ----
        allow_s = gv[..., :, None] & gv[..., None, :]
        local = g
        for i in range(enc_layers):
            local = _enc_layer(params[f"enc_{i}"], local, allow_s, num_heads)
        local = jnp.where(gv[..., None], local, 0.0)

        # ---- temporal decoder: dual-stream windows with 1-frame halo ----
        last_window = f_last - 1
        vA = gv & (fno[:, None] <= last_window)   # former stream validity
        vB = gv & (fno[:, None] >= 1)             # latter stream validity
        right_to_left = [(i + 1, i) for i in range(n - 1)]
        left_to_right = [(i, i + 1) for i in range(n - 1)]
        idx = jax.lax.axis_index(axis)

        def pull_next_first(rows):
            """next shard's first frame row -> appended after my last frame."""
            halo = jax.lax.ppermute(rows[:1], axis, right_to_left)
            return jnp.concatenate([rows[1:], halo], 0)

        vB_s = pull_next_first(vB)  # static across layers
        # the last shard's final window has no frame w+1 (ppermute left the
        # row untouched, not wrapped): kill its validity explicitly
        vB_s = vB_s.at[-1].set(jnp.where(idx == n - 1, False, vB_s[-1]))

        A, B = local, local
        allow_row = jnp.concatenate([vA, vB_s], 1)  # (Fl, 2L)
        allow_t = allow_row[..., :, None] & allow_row[..., None, :]
        pos = jnp.concatenate([
            jnp.broadcast_to(pe[0], A.shape), jnp.broadcast_to(pe[1], A.shape)], 1)
        for i in range(dec_layers):
            B_s = pull_next_first(B)
            x = jnp.concatenate([A, B_s], 1)        # (Fl, 2L, D) per window
            x = _dec_layer(params[f"dec_{i}"], x, pos, allow_t, num_heads)
            A = x[:, :A.shape[1]]
            B_s = x[:, A.shape[1]:]
            # return the updated halo row to its owner (next shard's frame 0)
            halo_back = jax.lax.ppermute(B_s[-1:], axis, left_to_right)
            B = jnp.concatenate([halo_back, B_s[:-1]], 0)

        # 'latter' fusion: frame 0 -> former stream, else latter stream
        out = jnp.where((fno[:, None, None] == 0), A, B)
        # no windows (all relations in frame 0): spatial output passes through
        out = jnp.where(f_last > 0, out, local)
        return jnp.where(gv[..., None], out, 0.0)

    out_grid = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P()),
        out_specs=P(axis))(grid, gvalid, frame_no, f_last)
    return grid_to_rel(out_grid, gather, rel_mask)

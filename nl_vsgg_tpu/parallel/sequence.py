"""Sequence (frame-axis) parallelism for the windowed temporal attention.

STTran's temporal stage attends within sliding windows of 2 consecutive
frames (lib/transformer_wk.py:158-171), so sharding a long video's frame
axis needs exactly a 1-frame halo: each shard receives its left neighbor's
last frame via `ppermute` (ring neighbor exchange over ICI), then computes
its frames' windowed attention locally. No ring attention, no all-gather —
the halo is the entire communication (SURVEY.md §2.9).

Layout: tokens are frame-major (F, L, D) with per-slot validity (F, L) —
the padded per-frame grid, F divisible by the mesh axis. The attention here
is the cross-frame op of the temporal decoder ('latter' fusion: frame f
attends over frames f-1 and f; frame 0 over frames 0 and 1 as the 'former'
slot); the decoder's FFN/norms are pointwise per token and shard trivially.

`windowed_attention_reference` is the dense equivalent used for parity
tests; `windowed_attention_sharded` wraps the same math in shard_map.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NEG_INF = -1e30


def _attn(q, k, v, allow, wq, wk, wv, wo, num_heads: int):
    """Masked MHA with packed (L_q, D) x (L_k, D) inputs."""
    E = q.shape[-1]
    D = E // num_heads

    def split(x):
        return jnp.moveaxis(x.reshape(*x.shape[:-1], num_heads, D), -2, -3)

    qh = split(q @ wq["kernel"] + wq["bias"])
    kh = split(k @ wk["kernel"] + wk["bias"])
    vh = split(v @ wv["kernel"] + wv["bias"])
    logits = jnp.einsum("...hqd,...hkd->...hqk", qh, kh) / jnp.sqrt(D).astype(q.dtype)
    logits = jnp.where(allow[..., None, :, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    probs = jnp.where(allow.any(-1)[..., None, :, None], probs, 0.0)
    out = jnp.einsum("...hqk,...hkd->...hqd", probs, vh)
    out = jnp.moveaxis(out, -3, -2).reshape(*q.shape[:-1], E)
    return out @ wo["kernel"] + wo["bias"]


def _frame_windows(tokens, valid, pos, params, num_heads):
    """Per-frame windowed attention given (F, L, D) plus a left halo row.

    tokens/valid include the halo at index 0: row i corresponds to global
    frame (start + i - 1). Returns outputs for rows 1.. (the local frames).
    """
    F_plus, L, Dm = tokens.shape
    prev_t = tokens[:-1] + pos[0]          # left neighbor, 'former' slot
    cur_q = tokens[1:] + pos[1]            # each frame as the 'latter' slot
    kv = jnp.concatenate([prev_t, tokens[1:] + pos[1]], axis=1)  # (F, 2L, D)
    allow = jnp.concatenate([valid[:-1], valid[1:]], axis=1)     # (F, 2L)
    allow = valid[1:][..., :, None] & allow[..., None, :]
    kv_raw = jnp.concatenate([tokens[:-1], tokens[1:]], axis=1)
    return _attn(cur_q, kv, kv_raw, allow,
                 params["q"], params["k"], params["v"], params["o"], num_heads)


def windowed_attention_reference(tokens, valid, params, pos, num_heads: int = 8):
    """Dense windowed temporal attention, frame-major (F, L, D).

    out[f] = attention of frame f's tokens (latter slot) over frames f-1, f;
    out[0] = frame 0 as the 'former' slot over frames 0, 1 (transformer_wk
    'latter' fusion, lib/transformer_wk.py:209-215).

    Requires F >= 2 (the frame-0 correction statically indexes tokens[1];
    single-frame videos skip the temporal stage entirely — see
    models/sttran.py). This is the standalone DEMO op; the production
    frame-sharded path is parallel/sttran_sp.py.
    """
    F, L, Dm = tokens.shape
    assert F >= 2, f"windowed attention needs >= 2 frames, got {F}"
    halo = jnp.zeros((1, L, Dm), tokens.dtype)
    halo_v = jnp.zeros((1, L), bool)
    t = jnp.concatenate([halo, tokens], 0)
    v = jnp.concatenate([halo_v, valid], 0)
    out = _frame_windows(t, v, pos, params, num_heads)
    # frame 0: former slot of window (0, 1)
    q0 = tokens[0] + pos[0]
    kv0 = jnp.concatenate([tokens[0] + pos[0], tokens[1] + pos[1]], 0)
    allow0 = valid[0][:, None] & jnp.concatenate([valid[0], valid[1]], 0)[None, :]
    out0 = _attn(q0, kv0, jnp.concatenate([tokens[0], tokens[1]], 0), allow0,
                 params["q"], params["k"], params["v"], params["o"], num_heads)
    out = out.at[0].set(out0)
    return jnp.where(valid[..., None], out, 0.0)


def windowed_attention_sharded(mesh: Mesh, axis: str = "data"):
    """shard_map version: frame axis sharded over `axis`, halo via ppermute."""

    def fn(tokens, valid, params, pos, num_heads: int = 8):
        n = mesh.shape[axis]
        # each shard's frame-0 correction statically indexes its second row,
        # so shards need >= 2 frames (F == n would trace t[1] out of bounds)
        assert tokens.shape[0] // n >= 2, (
            f"need >= 2 frames per shard: F={tokens.shape[0]}, shards={n}")

        def shard_fn(t, v, prm, ps):
            idx = jax.lax.axis_index(axis)
            # left halo: my last frame -> right neighbor (no wraparound use)
            perm = [(i, i + 1) for i in range(n - 1)]
            halo_t = jax.lax.ppermute(t[-1:], axis, perm)
            halo_v = jax.lax.ppermute(v[-1:], axis, perm)
            halo_v = jnp.where(idx == 0, False, halo_v)  # shard 0 has no left
            tt = jnp.concatenate([halo_t, t], 0)
            vv = jnp.concatenate([halo_v, v], 0)
            out = _frame_windows(tt, vv, ps, prm, num_heads)
            # global frame 0 (only on shard 0): former slot over frames 0, 1
            q0 = t[0] + ps[0]
            kv0 = jnp.concatenate([t[0] + ps[0], t[1] + ps[1]], 0)
            allow0 = v[0][:, None] & jnp.concatenate([v[0], v[1]], 0)[None, :]
            out0 = _attn(q0, kv0, jnp.concatenate([t[0], t[1]], 0), allow0,
                         prm["q"], prm["k"], prm["v"], prm["o"], num_heads)
            out = jnp.where(idx == 0, out.at[0].set(out0), out)
            return jnp.where(v[..., None], out, 0.0)

        return jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(axis), P(axis), P(), P()),
            out_specs=P(axis))(tokens, valid, params, pos)

    return fn

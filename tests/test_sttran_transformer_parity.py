"""Exactness check of the masked window-duplication ST-transformer against the
reference's transformer_wk (imported read-only from /root/reference at test
time — never vendored). This pins the trickiest semantics-preserving redesign:
sliding window-2 temporal attention with empty-frame dropping, reformulated as
one masked attention over duplicated former/latter token streams.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")

E, H, FF = 16, 2, 32


def _patch_mha_int_masks():
    """The reference passes int key_padding_masks (lib/transformer_wk.py:154),
    which current torch rejects; coerce to bool without changing semantics."""
    orig = torch.nn.MultiheadAttention.forward
    if getattr(torch.nn.MultiheadAttention, "_nlvsgg_patched", False):
        return

    def fwd(self, *args, **kw):
        kpm = kw.get("key_padding_mask")
        if kpm is not None and kpm.dtype not in (torch.bool, torch.float32):
            kw["key_padding_mask"] = kpm.bool()
        return orig(self, *args, **kw)

    torch.nn.MultiheadAttention.forward = fwd
    torch.nn.MultiheadAttention._nlvsgg_patched = True


def _desingularize_norm_bias(m):
    """The reference detects window padding with `sum(row) == 0`
    (lib/transformer_wk.py:173, lib/transformer.py:160): a REAL encoder
    output row whose activations sum to exactly 0.0 is silently masked as
    padding. Default-init LayerNorm (weight 1, bias 0) emits exactly
    mean-zero rows, so random-init fixtures hit that degenerate case by
    rounding luck (found round 3 via a dense im_idx grid that 'randomly'
    masked real rows). Trained checkpoints carry nonzero LayerNorm biases,
    where the event has measure zero — perturb the final encoder norm bias
    so fixtures match real-checkpoint conditions. (Our implementation masks
    by rel_mask/window membership and has no such singularity.)"""
    with torch.no_grad():
        for lay in m.local_attention.layers:
            lay.norm2.bias.add_(
                torch.linspace(0.01, 0.03, lay.norm2.bias.numel()))
    return m


def _load_reference_transformer(enc=1, dec=3, mode="latter"):
    if REF not in sys.path:
        sys.path.insert(0, REF)
    _patch_mha_int_masks()
    from lib.transformer_wk import transformer_wk
    torch.manual_seed(7)
    m = transformer_wk(enc_layer_num=enc, dec_layer_num=dec, embed_dim=E, nhead=H,
                       dim_feedforward=FF, dropout=0.0, mode=mode)
    m.eval()
    return _desingularize_norm_bias(m)


def _mha_params(mha):
    w = mha.in_proj_weight.detach().numpy()
    b = mha.in_proj_bias.detach().numpy()
    qw, kw, vw = np.split(w, 3, axis=0)
    qb, kb, vb = np.split(b, 3, axis=0)
    return {
        "q_proj": {"kernel": qw.T, "bias": qb},
        "k_proj": {"kernel": kw.T, "bias": kb},
        "v_proj": {"kernel": vw.T, "bias": vb},
        "out_proj": {"kernel": mha.out_proj.weight.detach().numpy().T,
                     "bias": mha.out_proj.bias.detach().numpy()},
    }


def _lin(linear):
    return {"kernel": linear.weight.detach().numpy().T,
            "bias": linear.bias.detach().numpy()}


def _ln(norm):
    return {"scale": norm.weight.detach().numpy(), "bias": norm.bias.detach().numpy()}


def _port_params(ref, enc, dec):
    params = {"position_embedding": ref.position_embedding.weight.detach().numpy()}
    for i in range(enc):
        layer = ref.local_attention.layers[i]
        params[f"enc_{i}"] = {
            "self_attn": _mha_params(layer.self_attn),
            "linear1": _lin(layer.linear1), "linear2": _lin(layer.linear2),
            "norm1": _ln(layer.norm1), "norm2": _ln(layer.norm2),
        }
    for i in range(dec):
        layer = ref.global_attention.layers[i]
        params[f"dec_{i}"] = {
            "multihead2": _mha_params(layer.multihead2),
            "linear1": _lin(layer.linear1), "linear2": _lin(layer.linear2),
            "norm3": _ln(layer.norm3),
        }
    return params


@pytest.mark.parametrize("mode", ["latter", "both"])
@pytest.mark.parametrize("im_idx_list", [
    [0, 0, 1, 2, 2, 2, 4, 4],   # empty frame 3 exercises retain_line
    [0, 1, 2, 3],
    [0, 0, 0],                   # single frame -> decoder skipped
    [0, 1],
])
def test_transformer_wk_parity(mode, im_idx_list):
    import jax.numpy as jnp
    from nl_vsgg_tpu.models.sttran import STTranTransformer

    enc, dec = 1, 3
    ref = _load_reference_transformer(enc, dec, mode)
    rng = np.random.default_rng(0)
    R = len(im_idx_list)
    feats = rng.standard_normal((R, E)).astype(np.float32)
    im_idx = np.array(im_idx_list, dtype=np.int64)

    with torch.no_grad():
        ref_out, _, _ = ref(torch.from_numpy(feats), torch.from_numpy(im_idx))
    ref_out = ref_out.numpy()

    model = STTranTransformer(embed_dim=E, num_heads=H, dim_feedforward=FF,
                              dropout=0.0, enc_layers=enc, dec_layers=dec, mode=mode)
    params = _port_params(ref, enc, dec)
    num_frames = int(im_idx.max()) + 1
    got = model.apply({"params": params}, jnp.asarray(feats),
                      jnp.asarray(im_idx, jnp.int32),
                      jnp.ones((R,), bool), jnp.int32(num_frames), train=False)
    np.testing.assert_allclose(np.asarray(got), ref_out, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("mode", ["latter", "both"])
@pytest.mark.parametrize("im_idx_list,num_frames", [
    ([0, 0, 0], 4),       # relations ONLY in frame 0 of a 4-frame video:
                          # b = im_idx[-1]+1 = 1 -> ZERO windows -> the
                          # reference passes the spatial output through
    ([0, 0, 1, 1], 6),    # trailing relation-less frames: b=2, windows 0..0;
                          # frame 1 is the LAST window frame ('both' takes
                          # latter-only, not the averaged middle)
])
def test_transformer_wk_trailing_empty_frames(mode, im_idx_list, num_frames):
    """The reference sizes its window grid by the LAST RELATION-BEARING frame
    (b = int(im_idx[-1] + 1), lib/transformer_wk.py:135) — the video's total
    frame count is irrelevant. Our module receives num_frames > b and must
    still match."""
    import jax.numpy as jnp
    from nl_vsgg_tpu.models.sttran import STTranTransformer

    enc, dec = 1, 2
    ref = _load_reference_transformer(enc, dec, mode)
    rng = np.random.default_rng(5)
    R = len(im_idx_list)
    feats = rng.standard_normal((R, E)).astype(np.float32)
    im_idx = np.array(im_idx_list, dtype=np.int64)
    with torch.no_grad():
        ref_out, _, _ = ref(torch.from_numpy(feats), torch.from_numpy(im_idx))
    model = STTranTransformer(embed_dim=E, num_heads=H, dim_feedforward=FF,
                              dropout=0.0, enc_layers=enc, dec_layers=dec,
                              mode=mode)
    got = model.apply({"params": _port_params(ref, enc, dec)},
                      jnp.asarray(feats), jnp.asarray(im_idx, jnp.int32),
                      jnp.ones((R,), bool), jnp.int32(num_frames), train=False)
    np.testing.assert_allclose(np.asarray(got), ref_out.numpy(),
                               rtol=2e-4, atol=2e-5)


def test_transformer_padding_invariance():
    """Padded relations must not change valid outputs."""
    import jax
    import jax.numpy as jnp
    from nl_vsgg_tpu.models.sttran import STTranTransformer

    rng = np.random.default_rng(3)
    R, pad = 6, 5
    feats = rng.standard_normal((R, E)).astype(np.float32)
    im_idx = np.array([0, 0, 1, 1, 2, 2], np.int32)

    model = STTranTransformer(embed_dim=E, num_heads=H, dim_feedforward=FF,
                              dropout=0.0, enc_layers=1, dec_layers=2)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                        jnp.asarray(im_idx), jnp.ones((R,), bool), jnp.int32(3))
    out_small = model.apply(params, jnp.asarray(feats), jnp.asarray(im_idx),
                            jnp.ones((R,), bool), jnp.int32(3))

    feats_p = np.concatenate([feats, rng.standard_normal((pad, E)).astype(np.float32)])
    im_idx_p = np.concatenate([im_idx, np.zeros(pad, np.int32)])
    mask_p = np.array([True] * R + [False] * pad)
    out_pad = model.apply(params, jnp.asarray(feats_p), jnp.asarray(im_idx_p),
                          jnp.asarray(mask_p), jnp.int32(3))
    np.testing.assert_allclose(np.asarray(out_pad)[:R], np.asarray(out_small),
                               rtol=1e-5, atol=1e-6)
    assert np.abs(np.asarray(out_pad)[R:]).max() == 0.0


def _load_reference_org(enc=1, dec=3, mode="latter"):
    """The 'org' variant (lib/transformer.py::transformer) — wk WITHOUT the
    empty-frame row removal (retain_line, lib/transformer_wk.py:145-150).
    The reference hardcodes wk at lib/sttran.py:358; org is importable."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    _patch_mha_int_masks()
    from lib.transformer import transformer
    torch.manual_seed(7)
    m = transformer(enc_layer_num=enc, dec_layer_num=dec, embed_dim=E,
                    nhead=H, dim_feedforward=FF, dropout=0.0, mode=mode)
    m.eval()
    return _desingularize_norm_bias(m)


@pytest.mark.parametrize("mode", ["latter", "both"])
@pytest.mark.parametrize("im_idx_list", [
    [0, 0, 1, 2, 2, 2, 3, 3],   # dense multi-frame (every frame populated)
    [0, 1, 2, 3],
    [0, 0, 0],                   # single frame -> decoder skipped
    [0, 1],
])
def test_org_transformer_parity(mode, im_idx_list):
    """transformer_mode='org' == the wk transformer everywhere org is
    defined (each frame 0..b-1 populated — its fully-masked attention rows
    NaN otherwise), EXCEPT window-less videos where org leaves its
    zeros-initialized output untouched (lib/transformer.py:165,185-189) and
    wk passes the spatial output through. STTranTransformer(variant='org')
    implements exactly that; this golden pins it against the LIVE reference
    org class with transplanted weights, including the zeros quirk."""
    import jax.numpy as jnp
    from nl_vsgg_tpu.models.sttran import STTranTransformer

    enc, dec = 1, 3
    ref = _load_reference_org(enc, dec, mode)
    rng = np.random.default_rng(3)
    R = len(im_idx_list)
    feats = rng.standard_normal((R, E)).astype(np.float32)
    im_idx = np.array(im_idx_list, dtype=np.int64)

    with torch.no_grad():
        ref_out, _, _ = ref(torch.from_numpy(feats), torch.from_numpy(im_idx))
    ref_out = ref_out.numpy()
    assert np.isfinite(ref_out).all()  # dense input: org is well-defined

    model = STTranTransformer(embed_dim=E, num_heads=H, dim_feedforward=FF,
                              dropout=0.0, enc_layers=enc, dec_layers=dec,
                              mode=mode, variant="org")
    params = _port_params(ref, enc, dec)
    num_frames = int(im_idx.max()) + 1
    got = model.apply({"params": params}, jnp.asarray(feats),
                      jnp.asarray(im_idx, jnp.int32),
                      jnp.ones((R,), bool), jnp.int32(num_frames), train=False)
    np.testing.assert_allclose(np.asarray(got), ref_out, rtol=2e-4, atol=2e-5)

"""Full-model golden parity: our STTran and DSGDETR flax models vs the
reference lib/sttran.py and lib/dsg_detr.py (torch, eval mode) with
transplanted weights on the same synthetic Entry.

This pins every conversion detail at once: NHWC conv layouts, the vr_fc
flatten permutation, masked-BatchNorm running stats, MHA qkv packing, the
windowed/tracklet attention reformulations, and the 37-row embedding-table
quirk (torch .weight.data assignment bypassing the declared size).
"""

import os
import sys
import types

import numpy as np
import pytest

import jax

from nl_vsgg_tpu.data.synthetic import make_synthetic_entry
from nl_vsgg_tpu.models.dsg_detr import DSGDETR
from nl_vsgg_tpu.models.sttran import STTran

REF = "/root/reference"
torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")

FEAT = 2048  # reference hardcodes 2048-d features


def _stub_reference_imports():
    from tests.ref_stubs import install
    install()


# ---------- torch -> flax weight conversion ----------

def _lin(m):
    return {"kernel": m.weight.detach().numpy().T, "bias": m.bias.detach().numpy()}


def _bn(m):
    return ({"scale": m.weight.detach().numpy(), "bias": m.bias.detach().numpy()},
            {"mean": m.running_mean.detach().numpy(), "var": m.running_var.detach().numpy()})


def _conv(m):
    return {"kernel": m.weight.detach().numpy().transpose(2, 3, 1, 0),
            "bias": m.bias.detach().numpy()}


def _mha(m):
    w = m.in_proj_weight.detach().numpy()
    b = m.in_proj_bias.detach().numpy()
    qw, kw, vw = np.split(w, 3, 0)
    qb, kb, vb = np.split(b, 3, 0)
    return {"q_proj": {"kernel": qw.T, "bias": qb},
            "k_proj": {"kernel": kw.T, "bias": kb},
            "v_proj": {"kernel": vw.T, "bias": vb},
            "out_proj": _lin(m.out_proj)}


def _ln(m):
    return {"scale": m.weight.detach().numpy(), "bias": m.bias.detach().numpy()}


def _torch_encoder_layer(l):
    p = {"self_attn": _mha(l.self_attn), "linear1": _lin(l.linear1),
         "linear2": _lin(l.linear2), "norm1": _ln(l.norm1), "norm2": _ln(l.norm2)}
    return p


def _vr_fc(m):
    """torch flattens (C,7,7); ours flattens (7,7,C) — permute input dim."""
    w = m.weight.detach().numpy()  # (512, 256*49) input idx = c*49 + h*7 + w
    w = w.reshape(512, 256, 7, 7).transpose(0, 2, 3, 1).reshape(512, 256 * 49)
    return {"kernel": w.T, "bias": m.bias.detach().numpy()}


def _object_classifier_wk(oc):
    """Shared WK head (lib/sttran.py:20-51 / lib/dsg_detr.py:82-120)."""
    bn_pos, bs_pos = _bn(oc.pos_embed[0])
    bn_dec, bs_dec = _bn(oc.decoder_lin[1])
    params = {
        "obj_embed": oc.obj_embed.weight.detach().numpy(),
        "pos_bn": bn_pos, "pos_fc": _lin(oc.pos_embed[1]),
        "decoder_fc1": _lin(oc.decoder_lin[0]),
        "decoder_bn": bn_dec,
        "decoder_fc2": _lin(oc.decoder_lin[3] if len(oc.decoder_lin) > 3
                            else oc.decoder_lin[-1]),
    }
    stats = {"pos_bn": bs_pos, "decoder_bn": bs_dec}
    return params, stats


def _spatial_conv(conv_seq):
    """The 2->256 mask tower (Conv,ReLU,BN,MaxPool,Conv,ReLU,BN)."""
    bn1, bs1 = _bn(conv_seq[2])
    bn2, bs2 = _bn(conv_seq[6])
    return ({"conv1": _conv(conv_seq[0]), "bn1": bn1,
             "conv2": _conv(conv_seq[4]), "bn2": bn2},
            {"bn1": bs1, "bn2": bs2})


def _common_head(ref):
    oc_p, oc_s = _object_classifier_wk(ref.object_classifier)
    sc_p, sc_s = _spatial_conv(ref.conv)
    params = {
        "object_classifier": oc_p,
        "subj_fc": _lin(ref.subj_fc), "obj_fc": _lin(ref.obj_fc),
        "vr_fc": _vr_fc(ref.vr_fc),
        # our union_func1 is a channel-axis Dense (== the reference's 1x1
        # conv): kernel (2048, 256) from the conv's (256, 2048, 1, 1)
        "union_func1": {
            "kernel": ref.union_func1.weight.detach().numpy()[:, :, 0, 0].T,
            "bias": ref.union_func1.bias.detach().numpy()},
        "spatial_conv": sc_p,
        "obj_embed": ref.obj_embed.weight.detach().numpy(),
        "obj_embed2": ref.obj_embed2.weight.detach().numpy(),
        "a_rel_compress": _lin(ref.a_rel_compress),
        "s_rel_compress": _lin(ref.s_rel_compress),
        "c_rel_compress": _lin(ref.c_rel_compress),
    }
    stats = {"object_classifier": oc_s, "spatial_conv": sc_s}
    return params, stats


def _entry_to_torch(e):
    nb = int(np.asarray(e.box_mask).sum())
    nr = int(np.asarray(e.rel_mask).sum())
    t = lambda a, dt=torch.float32: torch.as_tensor(np.asarray(a), dtype=dt)
    return {
        "boxes": torch.cat([t(e.box_frame[:nb]).float()[:, None], t(e.boxes[:nb])], 1),
        "labels": t(e.labels[:nb], torch.long),
        "scores": t(e.scores[:nb]),
        "distribution": t(e.distribution[:nb]),
        "features": t(e.features[:nb]),
        "pair_idx": t(e.pair_idx[:nr], torch.long),
        "im_idx": t(e.im_idx[:nr], torch.long),
        "union_feat": t(np.ascontiguousarray(
            np.moveaxis(np.asarray(e.union_feat[:nr]), -1, 1))),
        "spatial_masks": t(np.ascontiguousarray(
            np.moveaxis(np.asarray(e.spatial_masks[:nr]), -1, 1))),
    }


def _compare(ours, ref_entry, nr, atol=2e-4):
    for k_ours, k_ref in [("attention_distribution", "attention_distribution"),
                          ("spatial_distribution", "spatial_distribution"),
                          ("contacting_distribution", "contacting_distribution")]:
        a = np.asarray(ours[k_ours])[:nr]
        b = ref_entry[k_ref].detach().numpy()
        np.testing.assert_allclose(a, b, atol=atol, err_msg=k_ours)


class TestSTTranFullParity:
    def test_sgdet_wks_forward(self, rng):
        _stub_reference_imports()
        from lib.sttran import STTran as RefSTTran
        torch.manual_seed(11)
        classes = [f"c{i}" for i in range(37)]
        ref = RefSTTran(mode="sgdet", attention_class_num=3, spatial_class_num=6,
                        contact_class_num=17, obj_classes=classes, enc_layer_num=1,
                        dec_layer_num=3, is_wks=True, feat_dim=FEAT,
                        transformer_mode="wk").eval()

        entry = make_synthetic_entry(rng, n_frames=4, objs_per_frame=2,
                                     bucket_boxes=16, bucket_rels=12, feat_dim=FEAT)
        tentry = _entry_to_torch(entry)
        with torch.no_grad():
            ref_out = ref(dict(tentry))

        params, stats = _common_head(ref)
        # transformer_wk weights
        tr = ref.glocal_transformer
        gt_params = {"position_embedding":
                     tr.position_embedding.weight.detach().numpy()}
        for i, l in enumerate(tr.local_attention.layers):
            gt_params[f"enc_{i}"] = _torch_encoder_layer(l)
        for i, l in enumerate(tr.global_attention.layers):
            gt_params[f"dec_{i}"] = {
                "multihead2": _mha(l.multihead2), "linear1": _lin(l.linear1),
                "linear2": _lin(l.linear2), "norm3": _ln(l.norm3)}
        params["glocal_transformer"] = gt_params

        model = STTran(mode="sgdet", feat_dim=FEAT)
        variables = {"params": params, "batch_stats": stats}
        ours = model.apply(variables, entry, train=False)
        nr = int(np.asarray(entry.rel_mask).sum())
        _compare(ours, ref_out, nr)
        # object head too
        nb = int(np.asarray(entry.box_mask).sum())
        np.testing.assert_allclose(np.asarray(ours["distribution"])[:nb],
                                   ref_out["distribution"].detach().numpy(),
                                   atol=2e-4)


class TestDSGDETRFullParity:
    def test_sgdet_wks_forward(self, rng):
        _stub_reference_imports()
        from lib.dsg_detr import STTran as RefDSG
        torch.manual_seed(13)
        classes = [f"c{i}" for i in range(37)]
        ref = RefDSG(mode="sgdet", attention_class_num=3, spatial_class_num=6,
                     contact_class_num=17, obj_classes=classes).eval()

        entry = make_synthetic_entry(rng, n_frames=4, objs_per_frame=2,
                                     bucket_boxes=16, bucket_rels=12, feat_dim=FEAT)
        tentry = _entry_to_torch(entry)
        with torch.no_grad():
            ref_out = ref(dict(tentry))

        params, stats = _common_head(ref)
        for i, l in enumerate(ref.local_transformer.layers):
            params[f"local_{i}"] = _torch_encoder_layer(l)
        for i, l in enumerate(ref.global_transformer.layers):
            params[f"global_{i}"] = _torch_encoder_layer(l)

        model = DSGDETR(mode="sgdet", feat_dim=FEAT)
        variables = {"params": params, "batch_stats": stats}
        ours = model.apply(variables, entry, train=False)
        nr = int(np.asarray(entry.rel_mask).sum())
        _compare(ours, ref_out, nr)

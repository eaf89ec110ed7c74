"""Strongest end-to-end golden test: cached detections -> grounding ->
STTran forward, ours vs the full reference pipeline with transplanted
weights on the same random videos. Combines the entry-parity and
model-parity tests into one pipeline-level check of the final relation
distributions."""

import os
import sys

import numpy as np
import pytest

from nl_vsgg_tpu.data.grounding import FrameDetections, wk_forward
from nl_vsgg_tpu.models.sttran import STTran
from tests.test_grounding import _deepcopy_dets, _synthetic_video
from tests.test_model_parity import (FEAT, _common_head, _entry_to_torch,
                                     _stub_reference_imports,
                                     _torch_encoder_layer, _mha, _lin, _ln)

REF = "/root/reference"
torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")

ASSETS = os.path.join(os.path.dirname(__file__), "..", "assets")


@pytest.mark.slow
def test_pipeline_distributions_match(rng, monkeypatch):
    _stub_reference_imports()
    import lib.assign_pseudo_label as apl
    real_device = torch.device
    monkeypatch.setattr(apl.torch, "device", lambda spec: real_device("cpu"))
    from lib.sttran import STTran as RefSTTran

    torch.manual_seed(21)
    classes = [f"c{i}" for i in range(37)]
    ref_model = RefSTTran(mode="sgdet", attention_class_num=3,
                          spatial_class_num=6, contact_class_num=17,
                          obj_classes=classes, enc_layer_num=1,
                          dec_layer_num=3, is_wks=True, feat_dim=FEAT,
                          transformer_mode="wk").eval()
    params, stats = _common_head(ref_model)
    tr = ref_model.glocal_transformer
    gt_params = {"position_embedding": tr.position_embedding.weight.detach().numpy()}
    for i, l in enumerate(tr.local_attention.layers):
        gt_params[f"enc_{i}"] = _torch_encoder_layer(l)
    for i, l in enumerate(tr.global_attention.layers):
        gt_params[f"dec_{i}"] = {
            "multihead2": _mha(l.multihead2), "linear1": _lin(l.linear1),
            "linear2": _lin(l.linear2), "norm3": _ln(l.norm3)}
    params["glocal_transformer"] = gt_params
    ours_model = STTran(mode="sgdet", feat_dim=FEAT)
    variables = {"params": params, "batch_stats": stats}

    for trial in range(2):
        dets_list, feats_list, gt = _synthetic_video(rng, n_frames=3, n_dets=6)

        # ---- reference: grounding -> model ----
        p_det, p_feat, o_det, o_feat = \
            apl.assign_label_to_proposals_by_dict_for_video(
                _deepcopy_dets(dets_list), feats_list, True, gt, None,
                dict_path=ASSETS)
        ref_entry = apl.convert_data(True, [], p_det, p_feat, o_det, o_feat,
                                     gt, None, None, None,
                                     union_box_feature=False)
        if ref_entry is None:
            continue
        with torch.no_grad():
            ref_out = ref_model(dict(ref_entry))

        # ---- ours: grounding -> model (same bucket = exact row count) ----
        frames = [FrameDetections(
            classes=np.asarray([d["class"] for d in dets], np.int64),
            confs=np.asarray([float(d["conf"]) for d in dets], np.float32),
            rects=np.stack([d["rect"] for d in dets]),
            feats=feats_list[i]) for i, dets in enumerate(dets_list)]
        nb = int(ref_entry["boxes"].shape[0])
        nr = int(ref_entry["pair_idx"].shape[0])
        ours_entry = wk_forward(frames, gt, True, nb, nr,
                                assets_dir=ASSETS, feat_dim=FEAT)
        ours_out = ours_model.apply(variables, ours_entry, train=False)

        for key in ("attention_distribution", "spatial_distribution",
                    "contacting_distribution"):
            np.testing.assert_allclose(
                np.asarray(ours_out[key])[:nr],
                ref_out[key].detach().numpy(), atol=3e-4,
                err_msg=f"trial {trial}: {key}")
        np.testing.assert_allclose(
            np.asarray(ours_out["distribution"])[:nb],
            ref_out["distribution"].detach().numpy(), atol=3e-4)

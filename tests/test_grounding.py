"""Golden parity of the grounding engine against the reference's
assign_label_to_proposals_by_dict_for_image + convert_data (imported from
/root/reference with its GPU/native deps stubbed; tensors forced to CPU)."""

import os
import sys
import types

import numpy as np
import pytest

from nl_vsgg_tpu.data import schema
from nl_vsgg_tpu.data.grounding import (FrameDetections, assign_labels_video,
                                        build_entry, create_dis, entry_to_pred,
                                        wk_forward)

REF = "/root/reference"
torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")

ASSETS = os.path.join(os.path.dirname(__file__), "..", "assets")


def _load_reference_module(monkeypatch):
    from tests.ref_stubs import install
    install()
    import lib.assign_pseudo_label as apl
    # the reference pins everything to cuda:0 (:1209); force CPU
    real_device = torch.device
    monkeypatch.setattr(apl.torch, "device",
                        lambda spec: real_device("cpu"))
    return apl


def _synthetic_video(rng, n_frames=4, n_dets=8):
    """dets/feats in reference format + pseudo-GT annotations."""
    _, ag_to_oi = schema.load_oi_ag_maps(ASSETS)
    oi_to_ag, _ = schema.load_oi_ag_maps(ASSETS)
    person_ids = list(ag_to_oi[1])
    mappable = [k for k, v in oi_to_ag.items() if v and k not in person_ids]
    dets_list, feats_list, gt = [], [], []
    for f in range(n_frames):
        dets, feats = [], []
        n_person = int(rng.integers(0, 3))  # some frames lack a person
        oi_classes = ([int(rng.choice(person_ids)) for _ in range(n_person)]
                      + [int(rng.choice(mappable)) for _ in range(n_dets - n_person)])
        rng.shuffle(oi_classes)
        for c in oi_classes:
            r = np.sort(rng.uniform(0, 400, 2)), np.sort(rng.uniform(0, 400, 2))
            dets.append({"class": c, "conf": np.float32(rng.uniform(0.1, 1.0)),
                         "rect": np.array([r[0][0], r[1][0], r[0][1] + 20, r[1][1] + 20],
                                          np.float32)})
            feats.append(rng.standard_normal(2048).astype(np.float32))
        dets_list.append(dets)
        feats_list.append(np.stack(feats))
        # pseudo-GT: person dict + a few object dicts whose classes overlap dets
        frame_gt = [{"person_bbox": np.zeros(4, np.float32)}]
        det_ag = sorted({c for d in dets for c in oi_to_ag.get(
            1593 if d["class"] == 1594 else d["class"], [])})
        picks = rng.choice(det_ag, size=min(3, len(det_ag)), replace=False) if det_ag else []
        extra = rng.integers(2, 37, size=1)  # a GT class with no detection
        for cls in list(picks) + list(extra):
            frame_gt.append({
                "class": int(cls), "bbox": np.zeros(4, np.float32),
                "attention_relationship": torch.tensor([int(rng.integers(0, 3))]),
                "spatial_relationship": torch.tensor(
                    sorted(rng.choice(6, size=int(rng.integers(1, 3)), replace=False).tolist())),
                "contacting_relationship": torch.tensor(
                    sorted(rng.choice(17, size=int(rng.integers(1, 3)), replace=False).tolist())),
            })
        gt.append(frame_gt)
    return dets_list, feats_list, gt


def _deepcopy_dets(dets_list):
    return [[dict(d) for d in dets] for dets in dets_list]


@pytest.mark.parametrize("is_train", [True, False])
def test_entry_parity_vs_reference(rng, monkeypatch, is_train):
    apl = _load_reference_module(monkeypatch)
    dets_list, feats_list, gt = _synthetic_video(rng)

    # ---- reference path (convert_data mutates dets; give it a copy) ----
    ref_p_det, ref_p_feat, ref_o_det, ref_o_feat = \
        apl.assign_label_to_proposals_by_dict_for_video(
            _deepcopy_dets(dets_list), feats_list, is_train, gt, None,
            dict_path=ASSETS)
    ref_entry = apl.convert_data(
        is_train, [], ref_p_det, ref_p_feat, ref_o_det, ref_o_feat, gt,
        None, None, None, union_box_feature=False)

    # ---- our path ----
    frames = [FrameDetections(
        classes=np.asarray([d["class"] for d in dets], np.int64),
        confs=np.asarray([float(d["conf"]) for d in dets], np.float32),
        rects=np.stack([d["rect"] for d in dets]),
        feats=feats_list[i]) for i, dets in enumerate(dets_list)]
    n_boxes = int(ref_entry["boxes"].shape[0]) if ref_entry is not None else 8
    n_rels = int(ref_entry["pair_idx"].shape[0]) if ref_entry is not None else 8
    ours = wk_forward(frames, gt, is_train, bucket_boxes=n_boxes,
                      bucket_rels=n_rels, assets_dir=ASSETS, feat_dim=2048)

    if ref_entry is None:
        assert ours is None
        return
    assert ours is not None

    np.testing.assert_allclose(ours.boxes, ref_entry["boxes"][:, 1:].numpy(), rtol=1e-6)
    np.testing.assert_array_equal(ours.box_frame, ref_entry["boxes"][:, 0].numpy())
    np.testing.assert_array_equal(ours.labels, ref_entry["labels"].numpy())
    np.testing.assert_allclose(ours.scores, ref_entry["scores"].numpy(), rtol=1e-6)
    np.testing.assert_allclose(ours.distribution, ref_entry["distribution"].numpy(),
                               rtol=1e-5)
    np.testing.assert_allclose(ours.features, ref_entry["features"].numpy(), rtol=1e-6)
    np.testing.assert_array_equal(ours.pair_idx, ref_entry["pair_idx"].numpy())
    np.testing.assert_array_equal(ours.im_idx, ref_entry["im_idx"].numpy())
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(ours.spatial_masks), -1, 1),
        ref_entry["spatial_masks"].numpy(), atol=1e-5)
    if is_train:
        for ours_mh, key, num in ((ours.attention_gt, "attention_gt", 3),
                                  (ours.spatial_gt, "spatial_gt", 6),
                                  (ours.contacting_gt, "contacting_gt", 17)):
            ref_mh = np.zeros((n_rels, num), np.float32)
            for i, ids in enumerate(ref_entry[key]):
                ref_mh[i, np.asarray(ids)] = 1.0
            np.testing.assert_array_equal(np.asarray(ours_mh), ref_mh)


@pytest.mark.parametrize("is_train", [True, False])
def test_union_feature_parity_vs_reference(rng, monkeypatch, is_train):
    """convert_data with union_box_feature=True (the shipped recipe,
    assign_pseudo_label.py:1320-1342) vs our build_entry with a union_feat_fn.
    Both sides use the same deterministic fake extractor (a fixed projection
    of the union box coords + a spatial ramp), so agreement verifies the
    union-box math, per-frame grouping/order, and channel layout."""
    apl = _load_reference_module(monkeypatch)
    dets_list, feats_list, gt = _synthetic_video(rng)

    W = rng.standard_normal((4, 2048)).astype(np.float32) * 0.1
    ramp = (0.1 * np.arange(7)[:, None] + 0.01 * np.arange(7)).astype(np.float32)

    def ref_extract(model, transforms, img, boxes):
        b = np.asarray(boxes.cpu() if hasattr(boxes, "cpu") else boxes, np.float32)
        base = b @ W  # (K, 2048)
        return torch.as_tensor(base[:, :, None, None] + ramp[None, None])

    monkeypatch.setattr(apl, "extract_feature_given_bbox", ref_extract)
    ref_p_det, ref_p_feat, ref_o_det, ref_o_feat = \
        apl.assign_label_to_proposals_by_dict_for_video(
            _deepcopy_dets(dets_list), feats_list, is_train, gt, None,
            dict_path=ASSETS)
    ref_entry = apl.convert_data(
        is_train, [], ref_p_det, ref_p_feat, ref_o_det, ref_o_feat, gt,
        None, None, None, union_box_feature=True,
        frame_path=[f"/nonexistent/{i}.png" for i in range(len(dets_list))])
    assert ref_entry is not None

    frames = [FrameDetections(
        classes=np.asarray([d["class"] for d in dets], np.int64),
        confs=np.asarray([float(d["conf"]) for d in dets], np.float32),
        rects=np.stack([d["rect"] for d in dets]),
        feats=feats_list[i]) for i, dets in enumerate(dets_list)]

    def union_feat_fn(frame_idx, boxes):
        base = np.asarray(boxes, np.float32) @ W  # (K, 2048)
        return base[:, None, None, :] + ramp[None, :, :, None]

    n_boxes = int(ref_entry["boxes"].shape[0])
    n_rels = int(ref_entry["pair_idx"].shape[0])
    ours = wk_forward(frames, gt, is_train, bucket_boxes=n_boxes,
                      bucket_rels=n_rels, union_feat_fn=union_feat_fn,
                      assets_dir=ASSETS, feat_dim=2048)
    assert ours is not None
    assert float(np.abs(np.asarray(ours.union_feat)).max()) > 0
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(ours.union_feat), -1, 1),
        ref_entry["union_feat"].numpy(), rtol=1e-5, atol=1e-6)


def test_create_dis_matches_reference(rng, monkeypatch):
    apl = _load_reference_module(monkeypatch)
    confs = rng.uniform(0, 1, 5).astype(np.float32)
    idxs = rng.integers(0, 36, 5)
    ours = create_dis(confs, idxs)
    for i in range(5):
        ref = apl.create_dis(float(confs[i]), int(idxs[i])).numpy()
        np.testing.assert_allclose(ours[i], ref, rtol=1e-6)


def test_no_person_video_returns_none(rng):
    # all detections map to objects, never person -> grounding must yield None
    oi_to_ag, ag_to_oi = schema.load_oi_ag_maps(ASSETS)
    person_ids = set(ag_to_oi[1])
    obj_cls = next(k for k, v in oi_to_ag.items() if v and k not in person_ids)
    frames = [FrameDetections(classes=np.array([obj_cls]),
                              confs=np.array([0.9], np.float32),
                              rects=np.array([[0, 0, 10, 10]], np.float32),
                              feats=np.zeros((1, 32), np.float32))]
    gt = [[{"person_bbox": np.zeros(4)}]]
    assert wk_forward(frames, gt, True, 8, 8, assets_dir=ASSETS, feat_dim=32) is None


def test_empty_person_ids_and_negative_classes(rng):
    """Degenerate taxonomies (no OI id maps to person) and negative class
    ids must behave like np.isin did: nothing is a person, no crash."""
    from nl_vsgg_tpu.data.grounding import assign_labels_frame_fast
    oi_to_ag, _ = schema.load_oi_ag_maps(ASSETS)
    frame = FrameDetections(classes=np.array([-1, 5]),
                            confs=np.array([0.9, 0.8], np.float32),
                            rects=np.zeros((2, 4), np.float32),
                            feats=np.zeros((2, 16), np.float32))
    g = assign_labels_frame_fast(frame, [], True, frozenset(), oi_to_ag)
    assert not g.has_person
    # negative ids clip to index 0 in the LUT — they must never read slot 0's
    # person bit (here id 0 IS a person)
    g2 = assign_labels_frame_fast(frame, [], True, frozenset({0}), oi_to_ag)
    assert not g2.has_person


def test_entry_to_pred_oracle_hits_full_recall(rng):
    """entry_to_pred + evaluator: grounded GT relations evaluated against the
    same GT graph must give R@50 = 1 when boxes/classes coincide."""
    from nl_vsgg_tpu.eval import SceneGraphEvaluator
    tax = schema.load_taxonomy()
    gt, frames_dets, feats = [], [], []
    # one frame, person + one object, GT boxes == det boxes
    person_box = np.array([10, 10, 100, 200], np.float32)
    obj_box = np.array([50, 60, 120, 160], np.float32)
    _, ag_to_oi = schema.load_oi_ag_maps(ASSETS)
    oi_to_ag, _ = schema.load_oi_ag_maps(ASSETS)
    person_oi = ag_to_oi[1][0]
    # find an OI class mapping to exactly one AG class
    obj_oi, obj_ag = next((k, v[0]) for k, v in oi_to_ag.items()
                          if len(v) == 1 and k not in set(ag_to_oi[1]))
    frames = [FrameDetections(
        classes=np.array([person_oi, obj_oi]),
        confs=np.array([0.9, 0.8], np.float32),
        rects=np.stack([person_box, obj_box]),
        feats=np.zeros((2, 32), np.float32))]
    gt = [[{"person_bbox": person_box[None]},
           {"class": obj_ag, "bbox": obj_box,
            "attention_relationship": torch.tensor([1]),
            "spatial_relationship": torch.tensor([2]),
            "contacting_relationship": torch.tensor([4])}]]
    entry = wk_forward(frames, gt, True, 8, 8, assets_dir=ASSETS, feat_dim=32)
    pred = entry_to_pred(entry)
    ev = SceneGraphEvaluator(mode="sgdet", taxonomy=tax)
    ev.evaluate_scene_graph(gt, pred)
    assert ev.recall[50][0] == 1.0


def test_fast_label_assignment_matches_loop(rng):
    """Vectorized assign_labels_frame_fast == the loop version, including
    multi-mapped class emission order, over fuzzed frames."""
    from nl_vsgg_tpu.data.grounding import (assign_labels_frame,
                                            assign_labels_frame_fast)
    oi_to_ag, ag_to_oi = schema.load_oi_ag_maps(ASSETS)
    person_ids = frozenset(ag_to_oi[1])
    multi = [k for k, v in oi_to_ag.items() if len(v) > 1]
    for trial in range(20):
        dets_list, feats_list, gt = _synthetic_video(rng, n_frames=1, n_dets=10)
        dets = dets_list[0]
        # inject multi-mapped classes to stress emission order
        for j in range(3):
            dets[j]["class"] = int(rng.choice(multi))
        # ensure the GT list covers some of the multimapped targets
        gt[0].append({"class": int(oi_to_ag[dets[0]["class"]][0]),
                      "bbox": np.zeros(4),
                      "attention_relationship": torch.tensor([0]),
                      "spatial_relationship": torch.tensor([0]),
                      "contacting_relationship": torch.tensor([0])})
        frame = FrameDetections(
            classes=np.asarray([d["class"] for d in dets], np.int64),
            confs=np.asarray([float(d["conf"]) for d in dets], np.float32),
            rects=np.stack([d["rect"] for d in dets]),
            feats=feats_list[0])
        for is_train in (True, False):
            a = assign_labels_frame(frame, gt[0], is_train, person_ids, oi_to_ag)
            b = assign_labels_frame_fast(frame, gt[0], is_train, person_ids, oi_to_ag)
            assert a.has_person == b.has_person
            if not a.has_person:
                continue
            np.testing.assert_array_equal(a.person_rect, b.person_rect)
            np.testing.assert_array_equal(a.obj_classes, b.obj_classes)
            np.testing.assert_array_equal(a.obj_rects, b.obj_rects)
            np.testing.assert_array_equal(a.obj_confs, b.obj_confs)
            np.testing.assert_array_equal(a.obj_feats, b.obj_feats)

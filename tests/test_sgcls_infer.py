"""SGCLS inference assignment tests (lib/sttran.py:93-170 semantics)."""

import numpy as np

from nl_vsgg_tpu.models.sgcls_infer import sgcls_assign


def _logits(rows):
    """rows: list of 37-vectors (pre-softmax)."""
    return np.asarray(rows, np.float32)


def test_human_selection_and_pairs():
    # frame 0: two boxes; box 0 looks most human (large col-1 logit)
    logits = _logits([
        [0, 9, 0, 0] + [0] * 33,   # person-ish
        [0, 0, 0, 9] + [0] * 33,   # class 3
        [0, 8, 0, 0] + [0] * 33,   # frame 1 person
        [0, 0, 9, 0] + [0] * 33,   # frame 1 class 2
    ])
    out = sgcls_assign(logits, np.array([0, 0, 1, 1]))
    assert out["pred_labels"][0] == 1 and out["pred_labels"][2] == 1
    assert out["pred_labels"][1] == 3 and out["pred_labels"][3] == 2
    np.testing.assert_array_equal(out["pair_idx"], [[0, 1], [2, 3]])
    np.testing.assert_array_equal(out["im_idx"], [0, 1])


def test_duplicate_resolution_keeps_best():
    # frame with three boxes all predicted class 5; only the best keeps it
    base = [0.0] * 37
    rows = []
    for s in (3.0, 5.0, 4.0):  # scores for class 5
        r = list(base)
        r[5] = s
        r[7] = s - 1.0  # second-best class 7
        rows.append(r)
    # plus a clear human
    h = list(base)
    h[1] = 9.0
    logits = _logits(rows + [h])
    out = sgcls_assign(logits, np.array([0, 0, 0, 0]))
    labels = out["pred_labels"][:3]
    assert (labels == 5).sum() == 1
    assert labels[1] == 5  # the highest scorer kept the class
    assert set(labels) == {5, 7}


def test_all_objects_pair_with_frame_human():
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((9, 37)).astype(np.float32)
    frames = np.array([0, 0, 0, 1, 1, 1, 2, 2, 2])
    out = sgcls_assign(logits, frames)
    # each frame has exactly one human; pairs only person->object
    assert len(out["human_idx"]) == 3
    pl = out["pred_labels"]
    for j, h in enumerate(out["human_idx"]):
        assert pl[h] == 1
    assert (pl[out["pair_idx"][:, 0]] == 1).all()
    assert (pl[out["pair_idx"][:, 1]] != 1).all()
    # distributions remain normalized rows except zeroed duplicates
    assert out["distribution"].shape == (9, 36)


def test_sgcls_assignment_golden_vs_reference(rng):
    """Fuzz the full sgcls eval assignment (softmax -> human selection ->
    duplicate resolution -> pair building) against the LIVE reference
    ObjectClassifier sgcls branch (lib/sttran.py:93-170), with the union
    extractor stubbed (we compare assignment fields, not union features)."""
    import os
    import sys

    import pytest

    REF = "/root/reference"
    if not os.path.isdir(REF):
        pytest.skip("reference not mounted")
    torch = pytest.importorskip("torch")
    from tests.ref_stubs import install
    install()
    import lib.sttran as ref_sttran
    from lib.fpn.box_utils import center_size

    # the union section must run (same method body) but its features are
    # irrelevant to the assignment fields under comparison
    ref_sttran.extract_feature_given_bbox_base_feat_torch = \
        lambda model, tr, img, boxes, fmap, flag: torch.zeros(
            (len(boxes), 2048, 7, 7))

    classes = [f"c{i}" for i in range(37)]
    torch.manual_seed(3)
    ref = ref_sttran.ObjectClassifier(mode="sgcls", obj_classes=classes).eval()

    for seed in range(5):
        r = np.random.default_rng(seed)
        F, per = 3, 4
        n = F * per
        frames = np.repeat(np.arange(F), per)
        boxes5 = np.concatenate(
            [frames[:, None].astype(np.float32),
             np.sort(r.uniform(0, 400, (n, 4)).astype(np.float32), axis=1)], 1)
        feats = r.standard_normal((n, 2048)).astype(np.float32)
        dist0 = r.uniform(0, 1, (n, 36)).astype(np.float32)

        entry = {
            "boxes": torch.as_tensor(boxes5),
            "features": torch.as_tensor(feats),
            "distribution": torch.as_tensor(dist0),
            "frame_names": list(range(F)),
            "cv2_imgs": [None] * F,
            "fmaps": [None] * F,
            "faset_rcnn_model": None,
            "transforms": None,
        }
        # the logits our host assignment starts from == the reference's own
        # decoder output on the same inputs
        with torch.no_grad():
            obj_embed = entry["distribution"] @ ref.obj_embed.weight
            pos = ref.pos_embed(center_size(entry["boxes"][:, 1:]))
            logits = ref.decoder_lin(
                torch.cat([entry["features"], obj_embed, pos], 1)).numpy()
            out_ref = ref(dict(entry))

        ours = sgcls_assign(logits, frames)
        np.testing.assert_array_equal(
            ours["pred_labels"], out_ref["pred_labels"].numpy())
        np.testing.assert_allclose(
            ours["pred_scores"], out_ref["pred_scores"].numpy(),
            rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(
            ours["pair_idx"], out_ref["pair_idx"].numpy())
        np.testing.assert_array_equal(
            ours["im_idx"], out_ref["im_idx"].numpy().astype(np.int64))
        np.testing.assert_allclose(
            ours["distribution"], out_ref["distribution"].numpy(),
            rtol=1e-5, atol=1e-6)

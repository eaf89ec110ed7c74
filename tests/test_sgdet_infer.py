"""Non-wks SGDET inference cleanup tests (clean_class + per-class NMS +
pair rebuild, lib/sttran.py:185-283 semantics)."""

import numpy as np

from nl_vsgg_tpu.models.sgdet_infer import clean_class, sgdet_assign


def _soft(rows):
    r = np.asarray(rows, np.float32)
    return r / r.sum(1, keepdims=True)


def test_clean_class_duplicates_with_next_best():
    dist = _soft([[0.1, 0.1, 0.1, 0.1, 0.6, 0.3] + [0.01] * 30,   # class 5 (idx 4 of 36 -> label 5)
                  [0.1, 0.8, 0.1, 0.1, 0.1, 0.1] + [0.01] * 30])
    boxes = np.array([[0, 0, 10, 10], [5, 5, 20, 20]], np.float32)
    frames = np.zeros(2, np.int64)
    feats = np.eye(2, 4, dtype=np.float32)
    labels = dist[:, 1:].argmax(1) + 2
    assert labels[0] == 5
    b2, f2, d2, ft2, l2 = clean_class(boxes, frames, dist, feats, labels, 5)
    assert len(b2) == 3  # one duplicate appended
    assert d2[2, 4] == 0  # class column zeroed
    assert l2[2] != 5     # relabeled to next best
    np.testing.assert_array_equal(b2[2], boxes[0])


def test_sgdet_assign_nms_and_pairs():
    rng = np.random.default_rng(0)
    # frame 0: human + two heavily-overlapping class-3 boxes + distinct class-7
    dist = _soft([
        [5.0, 0.1, 0.1] + [0.1] * 33,                 # person col 0
        [0.1, 0.1, 4.0] + [0.1] * 33,                 # class 4 (col 2 -> +2)
        [0.1, 0.1, 3.5] + [0.1] * 33,                 # same class, overlapping
        [0.1] * 6 + [4.0] + [0.1] * 29,               # class 8
    ])
    boxes = np.array([[0, 0, 50, 100], [60, 60, 100, 100],
                      [61, 61, 101, 101], [200, 200, 240, 260]], np.float32)
    frames = np.zeros(4, np.int64)
    feats = rng.standard_normal((4, 8)).astype(np.float32)
    out = sgdet_assign(boxes, frames, dist, feats)
    # overlapping same-class duplicate suppressed by NMS 0.6
    labels = out["pred_labels"]
    assert (labels == 1).sum() == 1
    # pairs: human with every non-person box
    assert (labels[out["pair_idx"][:, 0]] == 1).all()
    assert len(out["im_idx"]) == len(out["boxes"]) - 1
    # exactly the overlapping same-class duplicate was suppressed
    assert len(out["boxes"]) == 3
    assert sorted(labels.tolist()) == [1, 3, 7]


def test_sgdet_assignment_golden_vs_reference(rng):
    """Fuzz the non-wks sgdet test-time pass (clean_class x3 -> per-class
    NMS 0.6 -> human selection -> pairs) against the LIVE reference block
    (lib/sttran.py:185-283), with the reference's CUDA nms patched to the
    same +1-convention host NMS and RoIAlign/union extraction stubbed."""
    import os

    import pytest

    REF = "/root/reference"
    if not os.path.isdir(REF):
        pytest.skip("reference not mounted")
    torch = pytest.importorskip("torch")
    from tests.ref_stubs import install
    install()
    import lib.sttran as ref_sttran

    from nl_vsgg_tpu.models.sgdet_infer import _nms, sgdet_assign

    ref_sttran.nms = lambda bx, sc, th: torch.as_tensor(
        _nms(bx.numpy(), sc.numpy(), float(th)))

    classes = [f"c{i}" for i in range(37)]
    torch.manual_seed(4)
    ref = ref_sttran.ObjectClassifier(mode="sgdet", obj_classes=classes,
                                      is_wks=False).eval()

    for seed in range(5):
        r = np.random.default_rng(100 + seed)
        F, per = 3, 5
        n = F * per
        frames = np.repeat(np.arange(F), per)
        # clustered boxes so NMS actually suppresses; softmax rows biased
        # toward classes 5/8/17 so clean_class duplicates fire
        centers = r.uniform(50, 350, (n, 2))
        wh = r.uniform(30, 80, (n, 2))
        boxes = np.concatenate([centers - wh / 2, centers + wh / 2],
                               1).astype(np.float32)
        logits = r.standard_normal((n, 36)).astype(np.float32)
        logits[:, [4, 7, 16]] += 1.5  # columns of classes 5, 8, 17
        dist = np.exp(logits)
        dist /= dist.sum(1, keepdims=True)
        feats = r.standard_normal((n, 16)).astype(np.float32)

        entry = {
            "boxes": torch.as_tensor(np.concatenate(
                [frames[:, None].astype(np.float32), boxes], 1)),
            "features": torch.as_tensor(feats),
            "distribution": torch.as_tensor(dist),
            "labels": torch.zeros(n, dtype=torch.long),
            "scores": torch.zeros(n),
            # the real pipeline's detector stage provides these; clean_class
            # reads them (lib/sttran.py:62) before the block recomputes them
            "pred_labels": torch.as_tensor(dist[:, 1:].argmax(1) + 2),
            "pred_scores": torch.as_tensor(dist[:, 1:].max(1)),
            "fmaps": torch.zeros((F, 4, 4, 4)),
        }
        with torch.no_grad():
            out_ref = ref(dict(entry))

        ours = sgdet_assign(boxes, frames, dist, feats)
        np.testing.assert_allclose(
            ours["boxes"], out_ref["boxes"].numpy()[:, 1:], rtol=1e-6)
        np.testing.assert_array_equal(
            ours["box_frame"], out_ref["boxes"].numpy()[:, 0].astype(np.int64))
        np.testing.assert_allclose(
            ours["distribution"], out_ref["distribution"].numpy(), rtol=1e-6)
        np.testing.assert_array_equal(
            ours["pred_labels"], out_ref["pred_labels"].numpy())
        np.testing.assert_allclose(
            ours["pred_scores"], out_ref["pred_scores"].numpy(),
            rtol=1e-5, atol=1e-7)
        np.testing.assert_array_equal(
            ours["pair_idx"], out_ref["pair_idx"].numpy())
        np.testing.assert_array_equal(
            ours["im_idx"], out_ref["im_idx"].numpy().astype(np.int64))

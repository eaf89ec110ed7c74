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

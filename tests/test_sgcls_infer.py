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

"""Matcher + tracking tests: cost-matrix parity vs the reference formulas,
auction LSAP vs scipy, get_sequence fast paths, full tracker smoke."""

import os
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

from nl_vsgg_tpu.models.matcher import (HungarianMatcher, cosine_cost,
                                        solve_lsap_auction, solve_lsap_host)
from nl_vsgg_tpu.models.track import (clusters_to_groups, get_sequence_groups,
                                      track_video)

REF = "/root/reference"
torch = pytest.importorskip("torch")


def _load_ref_matcher():
    import importlib
    from tests.ref_stubs import install
    install()
    import lib.matcher as rm
    return importlib.reload(rm)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_cost_and_assignment_parity(rng):
    rm = _load_ref_matcher()
    n, m, d = 7, 5, 16
    out = {"boxes": rng.uniform(0, 1, (n, 4)).astype(np.float32),
           "features": rng.standard_normal((n, d)).astype(np.float32),
           "dists": rng.uniform(0, 1, (n, 37)).astype(np.float32)}
    tgt = {"boxes": rng.uniform(0, 1, (m, 4)).astype(np.float32),
           "features": rng.standard_normal((m, d)).astype(np.float32),
           "dists": rng.uniform(0, 1, (m, 37)).astype(np.float32)}
    tt = lambda v: {k: torch.as_tensor(x) for k, x in v.items()}
    ref = rm.HungarianMatcher(0.5, 1, 1, 0.5)
    r_row, r_col, r_c1, r_c2 = ref(tt(out), tt(tgt))
    ours = HungarianMatcher(0.5, 1, 1, 0.5)
    o_row, o_col, o_c1, o_c2 = ours(out, tgt)
    np.testing.assert_array_equal(o_row, r_row)
    np.testing.assert_array_equal(o_col, r_col)
    np.testing.assert_allclose(o_c1, r_c1.numpy(), atol=1e-5)
    np.testing.assert_allclose(o_c2, r_c2.numpy(), atol=1e-5)


def test_auction_matches_scipy(rng):
    for trial in range(5):
        n = 6
        cost = rng.uniform(0, 1, (n, n))
        row, col = solve_lsap_host(cost)
        assign = np.asarray(solve_lsap_auction(jnp.asarray(cost), n_iter=400))
        assert (assign >= 0).all()
        scipy_cost = cost[row, col].sum()
        ours_cost = cost[np.arange(n), assign].sum()
        # auction with finite eps is eps-optimal
        assert ours_cost <= scipy_cost + n * (1.0 / (n + 1)) + 1e-9
        assert len(set(assign.tolist())) == n  # a valid permutation


def test_get_sequence_groups():
    labels = np.array([1, 5, 1, 7, 5])
    g = get_sequence_groups(labels, None, "predcls")
    assert (g == labels).all()
    dist = np.zeros((4, 37))
    dist[np.arange(4), [3, 9, 3, 12]] = 1.0
    g = get_sequence_groups(None, dist, "sgdet")
    np.testing.assert_array_equal(g, [3, 9, 3, 12])


def test_track_video_sgcls_clusters(rng):
    """A box moving smoothly across frames joins one cluster; a far-away,
    different-class box forms its own."""
    F, D = 4, 8
    frames, boxes, feats, dists, labels = [], [], [], [], []
    featA = rng.standard_normal(D)
    featB = rng.standard_normal(D)
    for f in range(F):
        # object A drifts slowly
        frames += [f, f]
        boxes += [[10 + f, 10, 60 + f, 60], [200, 200, 260, 280]]
        feats += [featA + 0.01 * rng.standard_normal(D),
                  featB + 0.01 * rng.standard_normal(D)]
        da = np.zeros(37); da[4] = 1.0
        db = np.zeros(37); db[9] = 1.0
        dists += [da, db]
        labels += [4, 9]
    clusters = track_video(
        "sgcls", np.asarray(frames), np.asarray(boxes, np.float64),
        np.stack(feats), np.stack(dists), np.asarray(labels),
        frame_keys=list(range(F)), im_size=(640.0, 480.0))
    groups = clusters_to_groups(clusters, len(boxes))
    a_groups = groups[0::2]
    b_groups = groups[1::2]
    assert len(set(a_groups.tolist())) == 1
    assert len(set(b_groups.tolist())) == 1
    assert a_groups[0] != b_groups[0]


def test_tracker_nms_uses_plus_one_convention():
    """The tracker's reference NMS is fasterRCNN's _C.nms (+1 pixel areas,
    csrc nms.cu:16-19): boxes [0,0,4,4] vs [1,1,5,5] at threshold 0.4 overlap
    16/34=0.47 under +1 (suppress) but 9/23=0.39 under the 0-area convention
    (keep) — the keep set must follow the reference."""
    from nl_vsgg_tpu.models.track import _nms

    boxes = np.array([[0, 0, 4, 4], [1, 1, 5, 5]], np.float32)
    scores = np.array([0.9, 0.8], np.float32)
    keep = _nms(boxes, scores, 0.4)
    assert list(keep) == [0]  # +1 convention suppresses the second box


def test_clean_bbox_all_boxes_in_last_frame_returns_empty():
    """range(last_frame) skips the final frame (reference quirk); when every
    box sits there the empties must be rank-correct so track_video's
    argmax(1) does not crash."""
    from nl_vsgg_tpu.models.track import clean_bbox, track_video

    bf = np.array([2, 2], np.int32)
    boxes = np.array([[0, 0, 10, 10], [5, 5, 15, 15]], np.float32)
    feats = np.zeros((2, 8), np.float32)
    dists = np.tile(np.array([[0.9, 0.1]], np.float32), (2, 1))
    labels = np.array([1, 1], np.int64)
    fr, bx, ft, ds_, lb, mapping = clean_bbox(bf, boxes, feats, dists, labels)
    assert bx.shape == (0, 4) and ft.shape == (0, 8) and ds_.shape == (0, 2)
    # must not crash on the rank-correct empties (argmax(1) on (0, C))
    clusters = track_video("sgcls", bf, boxes, feats, dists, labels,
                           frame_keys=[0, 1, 2], im_size=(480.0, 640.0))
    assert isinstance(clusters, list)


def test_tracker_timeout_fires_across_empty_frames():
    """A track stale for >=50 frames of empty frames must expire
    (lib/track.py:43-62): an identical detection 60 frames later starts a
    NEW cluster. (The aging filter's operand order was a tautology that
    kept stale tracks alive forever.)"""
    from nl_vsgg_tpu.models.track import track_video

    bf = np.array([0, 60], np.int32)
    boxes = np.tile(np.array([[10, 10, 60, 60]], np.float32), (2, 1))
    feats = np.tile(np.ones((1, 8), np.float32), (2, 1))
    dists = np.tile(np.array([[0.9, 0.1]], np.float32), (2, 1))
    labels = np.array([1, 1], np.int64)
    clusters = track_video("sgcls", bf, boxes, feats, dists, labels,
                           frame_keys=list(range(61)),
                           im_size=(480.0, 640.0))
    assert sorted(map(sorted, clusters)) == [[0], [1]], \
        "the 50-frame timeout must split identical detections 60 frames apart"

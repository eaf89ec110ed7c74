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

"""Burn-in promotion of the on-device R@K scorer (DeviceEvalPromotion).

VERDICT r2 item 7: during epoch eval, compare eval/recall_jax vs the host
evaluator for the first N videos; on exact agreement let the device number
drive the plateau metric (mean R@20, /root/reference/tools/train_STTran.py:228)
and skip the host evaluator for the rest. ANY burn-in mismatch must fall back
to the full host eval for that epoch. These tests pin the state machine with
host-derived rows (device<->host numeric parity itself is covered by
tests/test_recall_jax.py).
"""

import numpy as np
import pytest

from nl_vsgg_tpu.eval import SceneGraphEvaluator
from tests.fixtures import load_tool
from tests.test_eval_recall import _random_video

pytest.importorskip("torch")


@pytest.fixture(scope="module")
def train_mod():
    return load_tool("train_STTran")


def _marks(ev):
    return {"recall": len(ev.recall[10]),
            "recall_nogc": len(ev.recall_nogc[10]),
            "semi": len(ev.semi_recall[10])}


def _host_score_row(ev, gt, pred):
    """Host-score one video and return its per-frame rows in the device
    layout ({name: (F, 3)}), i.e. exactly what a correct device scorer
    yields (parity pinned in tests/test_recall_jax.py)."""
    marks = _marks(ev)
    ev.evaluate_scene_graph(gt, pred)
    row = {"gt_dropped": 0}
    for name, sink in (("recall", ev.recall), ("recall_nogc", ev.recall_nogc),
                       ("semi", ev.semi_recall)):
        row[name] = np.stack(
            [np.asarray(sink[k][marks[name]:], np.float32)
             for k in (10, 20, 50)], axis=-1)
    return marks, row


def test_promotes_after_exact_burnin(train_mod, rng):
    ev = SceneGraphEvaluator(mode="sgdet")
    promo = train_mod.DeviceEvalPromotion(burnin=2)
    # burn-in: 2 videos, device rows == host rows
    for _ in range(2):
        gt, pred = _random_video(rng, n_frames=3, n_objs=2)
        assert promo.host_needed()
        marks, row = _host_score_row(ev, gt, pred)
        promo.add(row, ev, host_marks=marks)
    assert promo.promoted and not promo.host_needed()
    # post-promotion: device-only rows, host evaluator untouched
    n_host = len(ev.recall[20])
    gt, pred = _random_video(rng, n_frames=4, n_objs=2)
    ev2 = SceneGraphEvaluator(mode="sgdet")
    _, row = _host_score_row(ev2, gt, pred)
    promo.add(row, ev)
    assert len(ev.recall[20]) == n_host
    # plateau metric == host mean over the SAME videos (rows are host-exact)
    expect = float(np.mean(ev.recall[20] + ev2.recall[20]))
    assert promo.score(20) == pytest.approx(expect, abs=1e-7)


def test_value_mismatch_falls_back_for_the_epoch(train_mod, rng):
    ev = SceneGraphEvaluator(mode="sgdet")
    promo = train_mod.DeviceEvalPromotion(burnin=2)
    gt, pred = _random_video(rng, n_frames=3, n_objs=2)
    marks, row = _host_score_row(ev, gt, pred)
    promo.add(row, ev, host_marks=marks)
    gt, pred = _random_video(rng, n_frames=3, n_objs=2)
    marks, row = _host_score_row(ev, gt, pred)
    row["semi"] = row["semi"] + 0.25  # a divergent device scorer
    promo.add(row, ev, host_marks=marks)
    assert promo.checked == 2
    assert not promo.promoted and promo.host_needed()
    # the eval loop gates on promotion.ok: after demotion it stops calling
    # add() entirely (plain host eval), so `checked` freezes at the
    # mismatch — the epoch-end warning reports the true burn-in count
    assert not promo.ok
    # further agreement does NOT resurrect promotion within the epoch
    gt, pred = _random_video(rng, n_frames=3, n_objs=2)
    marks, row = _host_score_row(ev, gt, pred)
    promo.add(row, ev, host_marks=marks)
    assert not promo.promoted and promo.host_needed()


def test_gt_dropped_blocks_promotion(train_mod, rng):
    ev = SceneGraphEvaluator(mode="sgdet")
    promo = train_mod.DeviceEvalPromotion(burnin=1)
    gt, pred = _random_video(rng, n_frames=3, n_objs=2)
    marks, row = _host_score_row(ev, gt, pred)
    row["gt_dropped"] = 2  # device buckets truncated GT -> scores not exact
    promo.add(row, ev, host_marks=marks)
    assert not promo.promoted


def test_gt_dropped_after_promotion_uses_host_rows(train_mod, rng):
    """Post-promotion videos whose GT exceeds the device frame bucket must
    contribute HOST rows to the metric (the eval loop diverts them via
    add_host_rows), never truncated device scores — and must not demote."""
    ev = SceneGraphEvaluator(mode="sgdet")
    promo = train_mod.DeviceEvalPromotion(burnin=1)
    gt, pred = _random_video(rng, n_frames=3, n_objs=2)
    marks, row = _host_score_row(ev, gt, pred)
    promo.add(row, ev, host_marks=marks)
    assert promo.promoted
    # a long video: host-score and record host rows (loop's fallback branch)
    gt2, pred2 = _random_video(rng, n_frames=5, n_objs=2)
    marks2, _ = _host_score_row(ev, gt2, pred2)  # scores into ev
    # replicate the loop: marks captured BEFORE the host scored; rebuild
    ev2 = SceneGraphEvaluator(mode="sgdet")
    m0 = {"recall": 0, "recall_nogc": 0, "semi": 0}
    ev2.evaluate_scene_graph(gt2, pred2)
    promo.add_host_rows(ev2, m0)
    assert promo.promoted  # fallback never demotes
    expect = float(np.mean(ev.recall[20]))  # ev holds both videos host-scored
    assert promo.score(20) == pytest.approx(expect, abs=1e-7)


def test_frame_count_mismatch_blocks_promotion(train_mod, rng):
    ev = SceneGraphEvaluator(mode="sgdet")
    promo = train_mod.DeviceEvalPromotion(burnin=1)
    gt, pred = _random_video(rng, n_frames=3, n_objs=2)
    marks, row = _host_score_row(ev, gt, pred)
    for name in ("recall", "recall_nogc", "semi"):
        row[name] = row[name][:-1]  # device saw fewer GT frames
    promo.add(row, ev, host_marks=marks)
    assert not promo.promoted


def test_recheck_periodically_requests_host(train_mod, rng):
    """r3 advisor: burn-in only verifies the first N videos; with
    recheck_every=R every Rth post-promotion video must be host-compared so
    a late-manifesting divergence cannot silently bias the plateau metric."""
    ev = SceneGraphEvaluator(mode="sgdet")
    promo = train_mod.DeviceEvalPromotion(burnin=1, recheck_every=3)
    gt, pred = _random_video(rng, n_frames=3, n_objs=2)
    marks, row = _host_score_row(ev, gt, pred)
    promo.add(row, ev, host_marks=marks)
    assert promo.promoted
    seen = []
    for _ in range(6):
        need = promo.host_needed()
        seen.append(need)
        ev2 = SceneGraphEvaluator(mode="sgdet")
        gt, pred = _random_video(rng, n_frames=3, n_objs=2)
        marks2, row = _host_score_row(ev2, gt, pred)
        if need:  # the loop host-scores into ev and compares
            m = _marks(ev)
            ev.evaluate_scene_graph(gt, pred)
            promo.add(row, ev, host_marks=m)
        else:
            promo.add(row, ev)
    # every 3rd video is rechecked; agreement keeps the promotion
    assert seen == [False, False, True, False, False, True]
    assert promo.promoted and not promo.late_demoted


def test_recheck_mismatch_demotes_mid_epoch(train_mod, rng):
    ev = SceneGraphEvaluator(mode="sgdet")
    promo = train_mod.DeviceEvalPromotion(burnin=1, recheck_every=2)
    gt, pred = _random_video(rng, n_frames=3, n_objs=2)
    marks, row = _host_score_row(ev, gt, pred)
    promo.add(row, ev, host_marks=marks)
    assert promo.promoted
    # one device-only video, then the recheck tick catches a divergence
    ev2 = SceneGraphEvaluator(mode="sgdet")
    gt, pred = _random_video(rng, n_frames=3, n_objs=2)
    _, row = _host_score_row(ev2, gt, pred)
    assert not promo.host_needed()
    promo.add(row, ev)
    assert promo.host_needed()
    gt, pred = _random_video(rng, n_frames=3, n_objs=2)
    m = _marks(ev)
    ev.evaluate_scene_graph(gt, pred)
    _, bad = _host_score_row(SceneGraphEvaluator(mode="sgdet"), gt, pred)
    bad["semi"] = bad["semi"] + 0.25  # divergent device scorer
    promo.add(bad, ev, host_marks=m)
    assert promo.late_demoted and not promo.promoted
    # demoted: host scoring resumes for the rest of the epoch
    assert promo.host_needed()
    # score() still covers every video once the loop funnels host rows in
    ev3 = SceneGraphEvaluator(mode="sgdet")
    gt, pred = _random_video(rng, n_frames=4, n_objs=2)
    m3 = {"recall": 0, "recall_nogc": 0, "semi": 0}
    ev3.evaluate_scene_graph(gt, pred)
    promo.add_host_rows(ev3, m3)
    n_rows = sum(r["recall"].shape[0] for r in promo.rows)
    assert n_rows == 3 + 3 + 3 + 4


def test_recheck_zero_disables(train_mod, rng):
    ev = SceneGraphEvaluator(mode="sgdet")
    promo = train_mod.DeviceEvalPromotion(burnin=1, recheck_every=0)
    gt, pred = _random_video(rng, n_frames=3, n_objs=2)
    marks, row = _host_score_row(ev, gt, pred)
    promo.add(row, ev, host_marks=marks)
    assert promo.promoted
    for _ in range(5):
        assert not promo.host_needed()
        ev2 = SceneGraphEvaluator(mode="sgdet")
        gt, pred = _random_video(rng, n_frames=3, n_objs=2)
        _, row = _host_score_row(ev2, gt, pred)
        promo.add(row, ev)


def test_skip_rows_mirror_host_zero_rows(train_mod, rng):
    """Grounding-failure videos: the host appends one 0.0 row per frame
    (eval/recall.py evaluate_scene_graph empty-pred path); the promoted
    metric must include the same zero rows or the epoch mean is biased up."""
    ev = SceneGraphEvaluator(mode="sgdet")
    promo = train_mod.DeviceEvalPromotion(burnin=1)
    gt, pred = _random_video(rng, n_frames=3, n_objs=2)
    marks, row = _host_score_row(ev, gt, pred)
    promo.add(row, ev, host_marks=marks)
    assert promo.promoted
    gt2, _ = _random_video(rng, n_frames=5, n_objs=2)
    promo.add_skip(gt2)
    ev.evaluate_scene_graph(gt2, {})  # host twin of the skip
    assert promo.score(20) == pytest.approx(float(np.mean(ev.recall[20])),
                                            abs=1e-7)
    assert len(ev.recall[20]) == 3 + 5

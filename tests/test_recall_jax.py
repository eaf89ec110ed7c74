"""On-device batched R@K scorer parity vs the host evaluator."""

import numpy as np
import pytest

import jax.numpy as jnp

from nl_vsgg_tpu.data import schema
from nl_vsgg_tpu.eval import SceneGraphEvaluator
from nl_vsgg_tpu.eval.recall_jax import recall_video_with_constraint
from tests.test_eval_recall import _random_video

torch = pytest.importorskip("torch")


def _pack_gt(gt, evaluator, g_max=24):
    """AGTest-style gt frames -> padded (F, G, ...) triplet tensors using the
    evaluator's own GT-graph builder."""
    F = len(gt)
    trip = np.zeros((F, g_max, 3), np.int32)
    boxes8 = np.zeros((F, g_max, 8), np.float32)
    mask = np.zeros((F, g_max), bool)
    for f, frame_gt in enumerate(gt):
        e = evaluator._gt_entry(frame_gt)
        rels = e["gt_relations"]
        cls = e["gt_classes"].astype(np.int32)
        bx = e["gt_boxes"].astype(np.float32)
        n = min(len(rels), g_max)
        for i in range(n):
            s, o, p = rels[i]
            trip[f, i] = [cls[s], p, cls[o]]
            boxes8[f, i, :4] = bx[s]
            boxes8[f, i, 4:] = bx[o]
        mask[f, :n] = True
    return trip, boxes8, mask


def test_with_constraint_parity(rng):
    for trial in range(4):
        gt, pred = _random_video(rng, n_frames=3 + trial % 2, n_objs=2)
        host = SceneGraphEvaluator(mode="sgdet")
        host.evaluate_scene_graph(gt, pred)

        ev = SceneGraphEvaluator(mode="sgdet")  # builder access only
        trip, boxes8, mask = _pack_gt(gt, ev)
        att = np.asarray(pred["attention_distribution"], np.float32)
        att = np.exp(att - att.max(1, keepdims=True))
        att /= att.sum(1, keepdims=True)  # evaluator softmaxes attention
        recalls, has_gt = recall_video_with_constraint(
            jnp.asarray(trip), jnp.asarray(boxes8), jnp.asarray(mask),
            jnp.asarray(pred["pair_idx"], jnp.int32),
            jnp.asarray(pred["im_idx"], jnp.int32),
            jnp.ones(len(pred["im_idx"]), bool),
            jnp.asarray(att),
            jnp.asarray(pred["spatial_distribution"], jnp.float32),
            jnp.asarray(pred["contacting_distribution"], jnp.float32),
            jnp.asarray(pred["boxes"][:, 1:], jnp.float32),
            jnp.asarray(pred["pred_labels"], jnp.int32),
            jnp.asarray(pred["pred_scores"], jnp.float32),
            num_frames=len(gt))
        got = np.asarray(recalls)
        for ki, k in enumerate((10, 20, 50)):
            np.testing.assert_allclose(got[:, ki], host.recall[k], atol=1e-6,
                                       err_msg=f"trial {trial} R@{k}")


def test_no_constraint_parity(rng):
    from nl_vsgg_tpu.eval.recall_jax import recall_video_no_constraint
    for trial in range(4):
        gt, pred = _random_video(rng, n_frames=3, n_objs=2 + trial % 2)
        host = SceneGraphEvaluator(mode="sgdet")
        host.evaluate_scene_graph(gt, pred)
        ev = SceneGraphEvaluator(mode="sgdet")
        trip, boxes8, mask = _pack_gt(gt, ev)
        att = np.asarray(pred["attention_distribution"], np.float32)
        att = np.exp(att - att.max(1, keepdims=True))
        att /= att.sum(1, keepdims=True)
        recalls, _ = recall_video_no_constraint(
            jnp.asarray(trip), jnp.asarray(boxes8), jnp.asarray(mask),
            jnp.asarray(pred["pair_idx"], jnp.int32),
            jnp.asarray(pred["im_idx"], jnp.int32),
            jnp.ones(len(pred["im_idx"]), bool),
            jnp.asarray(att),
            jnp.asarray(pred["spatial_distribution"], jnp.float32),
            jnp.asarray(pred["contacting_distribution"], jnp.float32),
            jnp.asarray(pred["boxes"][:, 1:], jnp.float32),
            jnp.asarray(pred["pred_labels"], jnp.int32),
            jnp.asarray(pred["pred_scores"], jnp.float32),
            num_frames=len(gt))
        got = np.asarray(recalls)
        for ki, k in enumerate((10, 20, 50)):
            np.testing.assert_allclose(got[:, ki], host.recall_nogc[k], atol=1e-6,
                                       err_msg=f"trial {trial} nogc R@{k}")


def test_semi_parity(rng):
    from nl_vsgg_tpu.eval.recall_jax import recall_video_semi
    for trial in range(4):
        gt, pred = _random_video(rng, n_frames=3, n_objs=2)
        host = SceneGraphEvaluator(mode="sgdet")
        host.evaluate_scene_graph(gt, pred)
        ev = SceneGraphEvaluator(mode="sgdet")
        trip, boxes8, mask = _pack_gt(gt, ev)
        att = np.asarray(pred["attention_distribution"], np.float32)
        att = np.exp(att - att.max(1, keepdims=True))
        att /= att.sum(1, keepdims=True)
        recalls, _ = recall_video_semi(
            jnp.asarray(trip), jnp.asarray(boxes8), jnp.asarray(mask),
            jnp.asarray(pred["pair_idx"], jnp.int32),
            jnp.asarray(pred["im_idx"], jnp.int32),
            jnp.ones(len(pred["im_idx"]), bool),
            jnp.asarray(att),
            jnp.asarray(pred["spatial_distribution"], jnp.float32),
            jnp.asarray(pred["contacting_distribution"], jnp.float32),
            jnp.asarray(pred["boxes"][:, 1:], jnp.float32),
            jnp.asarray(pred["pred_labels"], jnp.int32),
            jnp.asarray(pred["pred_scores"], jnp.float32),
            num_frames=len(gt))
        got = np.asarray(recalls)
        for ki, k in enumerate((10, 20, 50)):
            np.testing.assert_allclose(got[:, ki], host.semi_recall[k], atol=1e-6,
                                       err_msg=f"trial {trial} semi R@{k}")


class _E:
    """Minimal Entry view for device_eval_video/batch (pred-derived)."""

    def __init__(self, pred):
        self.pair_idx = np.asarray(pred["pair_idx"], np.int32)
        self.im_idx = np.asarray(pred["im_idx"], np.int32)
        self.rel_mask = np.ones(len(self.im_idx), bool)
        self.boxes = np.asarray(pred["boxes"])[:, 1:].astype(np.float32)


def test_device_eval_batch_matches_per_video(rng):
    """The batch-packed scorer (one device call + one packed fetch per batch,
    VERDICT r3 #3) must return row-identical results to device_eval_video —
    including with a mixed-shape list (defensive group-by-shape path)."""
    from nl_vsgg_tpu.eval.recall_jax import (device_eval_batch,
                                             device_eval_video)
    # 3 same-shape videos + 2 of another shape exercises both the stacked
    # path and the shape grouping
    vids = [_random_video(rng, n_frames=3, n_objs=2) for _ in range(3)]
    vids += [_random_video(rng, n_frames=4, n_objs=2) for _ in range(2)]
    ev = SceneGraphEvaluator(mode="sgdet")
    entries = [_E(p) for _, p in vids]
    rows = device_eval_batch(entries, [p for _, p in vids],
                             [g for g, _ in vids], ev, f_bucket=5)
    assert len(rows) == len(vids)
    for (gt, pred), e, row in zip(vids, entries, rows):
        ref = device_eval_video(e, pred, gt, ev, f_bucket=5)
        assert row["gt_dropped"] == ref["gt_dropped"] == 0
        for name in ("recall", "recall_nogc", "semi"):
            np.testing.assert_allclose(row[name], ref[name], atol=1e-6,
                                       err_msg=name)


def test_device_eval_batch_reports_gt_dropped(rng):
    """A video whose GT exceeds the frame bucket must carry its nonzero
    gt_dropped so the eval loop can divert it to host scoring."""
    from nl_vsgg_tpu.eval.recall_jax import device_eval_batch
    gt, pred = _random_video(rng, n_frames=4, n_objs=2)
    ev = SceneGraphEvaluator(mode="sgdet")
    rows = device_eval_batch([_E(pred)], [pred], [gt], ev, f_bucket=3)
    assert rows[0]["gt_dropped"] > 0
    assert rows[0]["recall"].shape[0] <= 3


def test_mean_recall_parity(rng):
    from nl_vsgg_tpu.eval.recall_jax import mean_recall_video
    host = SceneGraphEvaluator(mode="sgdet")
    acc = [[[] for _ in range(26)] for _ in (10, 20, 50)]
    for trial in range(3):
        gt, pred = _random_video(rng, n_frames=3, n_objs=2)
        host.evaluate_scene_graph(gt, pred)
        ev = SceneGraphEvaluator(mode="sgdet")
        trip, boxes8, mask = _pack_gt(gt, ev)
        att = np.asarray(pred["attention_distribution"], np.float32)
        att = np.exp(att - att.max(1, keepdims=True))
        att /= att.sum(1, keepdims=True)
        hits, counts = mean_recall_video(
            jnp.asarray(trip), jnp.asarray(boxes8), jnp.asarray(mask),
            jnp.asarray(pred["pair_idx"], jnp.int32),
            jnp.asarray(pred["im_idx"], jnp.int32),
            jnp.ones(len(pred["im_idx"]), bool),
            jnp.asarray(att),
            jnp.asarray(pred["spatial_distribution"], jnp.float32),
            jnp.asarray(pred["contacting_distribution"], jnp.float32),
            jnp.asarray(pred["boxes"][:, 1:], jnp.float32),
            jnp.asarray(pred["pred_labels"], jnp.int32),
            jnp.asarray(pred["pred_scores"], jnp.float32),
            num_frames=len(gt))
        hits, counts = np.asarray(hits), np.asarray(counts)
        for f in range(len(gt)):
            for ki in range(3):
                for c in range(26):
                    if counts[f, c] > 0:
                        acc[ki][c].append(hits[f, ki, c] / counts[f, c])
    host.calculate_mean_recall()
    for ki, k in enumerate((10, 20, 50)):
        ours_list = [float(np.mean(a)) if a else 0.0 for a in acc[ki]]
        np.testing.assert_allclose(ours_list, host.mean_recall.recall_list[k],
                                   atol=1e-6, err_msg=f"mR@{k}")

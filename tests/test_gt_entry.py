"""GT-box entry builder (PredCLS/SGCLS) tests + the PredCLS end-to-end slice
on precomputed features (BASELINE config 1, CPU-runnable)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nl_vsgg_tpu.data import schema
from nl_vsgg_tpu.data.gt_entry import build_gt_entry
from nl_vsgg_tpu.eval import SceneGraphEvaluator
from nl_vsgg_tpu.models.sttran import STTran

FEAT = 64


def _gt_video(rng, n_frames=3, n_objs=2):
    gt = []
    for i in range(n_frames):
        frame = [{"person_bbox": np.array([[5 + i, 5, 90, 180]], np.float32)}]
        for m in range(n_objs):
            frame.append({
                "class": 2 + m, "bbox": np.array([20 + 30 * m, 30, 70 + 30 * m, 90]),
                "attention_relationship": np.array([rng.integers(0, 3)]),
                "spatial_relationship": np.array([rng.integers(0, 6)]),
                "contacting_relationship": np.array([rng.integers(0, 17)]),
            })
        gt.append(frame)
    return gt


def _feature_fn(rng):
    def fn(frame_idx, boxes):
        local = np.random.default_rng(1000 + frame_idx)
        return local.standard_normal((len(boxes), FEAT)).astype(np.float32)
    return fn


class TestBuildGTEntry:
    def test_predcls_structure(self, rng):
        gt = _gt_video(rng)
        e = build_gt_entry(gt, "predcls", 16, 12, _feature_fn(rng), feat_dim=FEAT)
        nb = int(np.asarray(e.box_mask).sum())
        nr = int(np.asarray(e.rel_mask).sum())
        assert nb == 9 and nr == 6
        # person first per frame with label 1, pairs person->object
        labels = np.asarray(e.labels)
        pair = np.asarray(e.pair_idx)[:nr]
        assert (labels[pair[:, 0]] == 1).all()
        assert (labels[pair[:, 1]] >= 2).all()
        assert (np.asarray(e.scores)[:nb] == 1.0).all()
        # spatial masks populated (non-zero), unions zero without extractor
        assert np.abs(np.asarray(e.spatial_masks)[:nr]).sum() > 0

    def test_sgcls_distribution(self, rng):
        gt = _gt_video(rng)

        def classify(feats):
            local = np.random.default_rng(3)
            return local.standard_normal((len(feats), 1595)).astype(np.float32)

        e = build_gt_entry(gt, "sgcls", 16, 12, _feature_fn(rng),
                           classify_fn=classify, feat_dim=FEAT)
        nb = int(np.asarray(e.box_mask).sum())
        d = np.asarray(e.distribution)[:nb]
        np.testing.assert_allclose(d.sum(1), 1.0, atol=1e-5)  # create_dis rows
        assert (np.asarray(e.scores)[:nb] == d.max(1)).all()

    def test_predcls_end_to_end_eval(self, rng):
        """PredCLS slice: GT entries -> STTran predcls -> evaluator. With GT
        boxes/labels the object channel is oracle; with-constraint R@50 must
        be well above zero even with a random relation head."""
        model = STTran(mode="predcls", feat_dim=FEAT)
        ev = SceneGraphEvaluator(mode="predcls")
        variables = None
        # 1 object/frame: 26 scored candidates < the R@50 cut, so oracle
        # boxes+labels make no-constraint recall exactly 1.0
        for v in range(3):
            gt = _gt_video(rng, n_frames=3, n_objs=1)
            e = build_gt_entry(gt, "predcls", 16, 12, _feature_fn(rng), feat_dim=FEAT)
            e = jax.tree.map(jnp.asarray, e)
            if variables is None:
                variables = model.init({"params": jax.random.key(0),
                                        "dropout": jax.random.key(1)}, e)
            pred = model.apply(variables, e, train=False)
            p = {k: np.asarray(val) for k, val in pred.items()}
            p.update(boxes=np.asarray(e.boxes), pair_idx=np.asarray(e.pair_idx),
                     im_idx=np.asarray(e.im_idx), rel_mask=np.asarray(e.rel_mask),
                     labels=np.asarray(e.labels), scores=np.asarray(e.scores))
            ev.evaluate_scene_graph(gt, p)
        # with-constraint: random argmax predicate -> E[R] ~ (1/3+1/6+1/17)/3
        r50 = float(np.mean(ev.recall[50]))
        assert r50 > 0.05, f"predcls oracle-box R@50 too low: {r50}"
        # no-constraint: every (pair, predicate) is proposed and boxes/classes
        # are oracle, so top-100 must recover every GT triplet
        ng50 = float(np.mean(ev.recall_nogc[50]))
        assert ng50 == pytest.approx(1.0), f"nogc R@50 {ng50}"

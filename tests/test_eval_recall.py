"""Golden parity: our SceneGraphEvaluator vs the reference's
lib/evaluation_recall.py on randomized videos (reference imported read-only
from /root/reference with its Cython IoU stubbed by a numpy equivalent)."""

import os
import sys
import types

import numpy as np
import pytest

from nl_vsgg_tpu.data import schema
from nl_vsgg_tpu.eval.recall import SceneGraphEvaluator, np_iou

REF = "/root/reference"
torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")


def _load_reference_evaluator():
    from tests.ref_stubs import install
    install()
    from lib.evaluation_recall import SceneGraphEvaluator as RefEvaluator
    return RefEvaluator


def _random_video(rng, n_frames=4, n_objs=3, flip_cls_prob=0.3, jitter=12.0):
    """GT annotations (reference AG_Test format) + a matching pred dict."""
    tax = schema.load_taxonomy()
    gt = []
    boxes, labels, scores, pair_idx, im_idx = [], [], [], [], []
    att_d, sp_d, con_d = [], [], []
    for f in range(n_frames):
        frame = [{"person_bbox": np.array([[10 + f, 10, 100 + f, 200]], np.float32)}]
        person_row = len(boxes)
        boxes.append([10 + f + rng.uniform(-2, 2), 10, 100 + f, 200])
        labels.append(1)
        scores.append(rng.uniform(0.8, 1.0))
        for m in range(n_objs):
            bb = np.array([30 + 40 * m, 50, 80 + 40 * m, 120], np.float32)
            cls = int(rng.integers(2, 37))
            frame.append({
                "bbox": bb, "class": cls,
                "attention_relationship": torch.tensor([int(rng.integers(0, 3))]),
                "spatial_relationship": torch.tensor(
                    sorted(rng.choice(6, size=rng.integers(1, 3), replace=False).tolist())),
                "contacting_relationship": torch.tensor(
                    sorted(rng.choice(17, size=rng.integers(1, 3), replace=False).tolist())),
            })
            # prediction box: jittered GT, sometimes wrong class
            jb = bb + rng.uniform(-jitter, jitter, 4).astype(np.float32)
            boxes.append(jb.tolist())
            pred_cls = cls if rng.uniform() > flip_cls_prob else int(rng.integers(2, 37))
            labels.append(pred_cls)
            scores.append(rng.uniform(0.3, 1.0))
            pair_idx.append([person_row, len(boxes) - 1])
            im_idx.append(f)
            att_d.append(rng.standard_normal(3))       # logits
            sp_d.append(rng.uniform(0, 1, 6))          # sigmoided
            con_d.append(rng.uniform(0, 1, 17))
        gt.append(frame)
    pred = {
        "boxes": np.concatenate([np.zeros((len(boxes), 1)), np.asarray(boxes)], 1),
        "labels": np.asarray(labels, np.int64),
        "scores": np.asarray(scores, np.float32),
        "pred_labels": np.asarray(labels, np.int64),
        "pred_scores": np.asarray(scores, np.float32),
        "pair_idx": np.asarray(pair_idx, np.int64),
        "im_idx": np.asarray(im_idx, np.int64),
        "attention_distribution": np.asarray(att_d, np.float32),
        "spatial_distribution": np.asarray(sp_d, np.float32),
        "contacting_distribution": np.asarray(con_d, np.float32),
    }
    return gt, pred


def _to_torch_pred(pred):
    return {k: torch.as_tensor(np.asarray(v)) for k, v in pred.items()}


@pytest.mark.parametrize("mode", ["sgdet", "predcls"])
def test_recall_parity_random_videos(rng, mode):
    RefEvaluator = _load_reference_evaluator()
    tax = schema.load_taxonomy()
    ref = RefEvaluator(
        mode=mode, AG_object_classes=list(tax.object_classes),
        AG_all_predicates=list(tax.relationship_classes),
        AG_attention_predicates=list(tax.attention_relationships),
        AG_spatial_predicates=list(tax.spatial_relationships),
        AG_contacting_predicates=list(tax.contacting_relationships),
        iou_threshold=0.5, constraint="with")
    ref.register_container()
    ours = SceneGraphEvaluator(mode=mode, taxonomy=tax)

    for v in range(6):
        gt, pred = _random_video(rng, n_frames=3 + v % 3, n_objs=2 + v % 2)
        ref.evaluate_scene_graph(gt, _to_torch_pred(pred))
        ours.evaluate_scene_graph(gt, pred)

    for k in (10, 20, 50):
        np.testing.assert_allclose(
            ours.recall[k], ref.result_dict[mode + "_recall"][k], atol=1e-8,
            err_msg=f"with-constraint R@{k}")
        np.testing.assert_allclose(
            ours.recall_nogc[k], ref.result_dict[mode + "_recall_nogc"][k], atol=1e-8,
            err_msg=f"no-constraint R@{k}")
        np.testing.assert_allclose(
            ours.semi_recall[k], ref.result_dict[mode + "_semi_recall"][k], atol=1e-8,
            err_msg=f"semi R@{k}")

    ref.calculate_mean_recall()
    ours.calculate_mean_recall()
    for k in (10, 20, 50):
        assert ours.mean_recall.mean_recall[k] == pytest.approx(
            ref.result_dict[mode + "_mean_recall"][k], abs=1e-8)
        assert ours.ng_mean_recall.mean_recall[k] == pytest.approx(
            ref.result_dict[mode + "_ng_mean_recall"][k], abs=1e-8)
        np.testing.assert_allclose(
            ours.mean_recall.recall_list[k],
            ref.result_dict[mode + "_mean_recall_list"][k], atol=1e-8)


def test_padding_rows_are_ignored(rng):
    gt, pred = _random_video(rng)
    ours1 = SceneGraphEvaluator(mode="sgdet")
    ours1.evaluate_scene_graph(gt, pred)
    # pad relations with garbage rows masked out
    R = len(pred["im_idx"])
    padded = dict(pred)
    pad = 7
    padded["pair_idx"] = np.concatenate([pred["pair_idx"], np.zeros((pad, 2), np.int64)])
    padded["im_idx"] = np.concatenate([pred["im_idx"], np.zeros(pad, np.int64)])
    for k in ("attention_distribution", "spatial_distribution", "contacting_distribution"):
        filler = np.full((pad, pred[k].shape[1]), 9.9, np.float32)
        padded[k] = np.concatenate([pred[k], filler])
    padded["rel_mask"] = np.concatenate([np.ones(R, bool), np.zeros(pad, bool)])
    ours2 = SceneGraphEvaluator(mode="sgdet")
    ours2.evaluate_scene_graph(gt, padded)
    for k in (10, 20, 50):
        np.testing.assert_allclose(ours1.recall[k], ours2.recall[k])
        np.testing.assert_allclose(ours1.semi_recall[k], ours2.semi_recall[k])


def test_empty_pred_counts_zero(rng):
    gt, _ = _random_video(rng, n_frames=2)
    ev = SceneGraphEvaluator(mode="sgdet")
    ev.evaluate_scene_graph(gt, {})
    assert all(r == 0.0 for r in ev.recall[20])
    assert len(ev.recall[20]) == 2

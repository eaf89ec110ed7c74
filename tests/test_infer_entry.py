"""Non-wks inference glue: raw detections -> sgdet_assign -> Entry ->
relation model forward -> evaluator (the full non-wks SGDET test path)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nl_vsgg_tpu.data.infer_entry import build_infer_entry
from nl_vsgg_tpu.eval import SceneGraphEvaluator
from nl_vsgg_tpu.models.sgdet_infer import sgdet_assign
from nl_vsgg_tpu.models.sttran import STTran

FEAT = 32


def _soft(x):
    e = np.exp(x - x.max(1, keepdims=True))
    return e / e.sum(1, keepdims=True)


def _detections(rng, n_frames=3):
    boxes, frames, dist, feats = [], [], [], []
    gt = []
    for f in range(n_frames):
        person_box = np.array([10, 10, 100, 200], np.float32)
        obj_box = np.array([40 + f, 60, 120 + f, 160], np.float32)
        logits = np.zeros((2, 36), np.float32)
        logits[0, 0] = 6.0           # person column
        logits[1, 3] = 6.0           # dist col 3 -> pred label 4
        boxes += [person_box, obj_box]
        frames += [f, f]
        dist.append(_soft(logits))
        feats.append(rng.standard_normal((2, FEAT)).astype(np.float32))
        gt.append([{"person_bbox": person_box[None]},
                   {"class": 4, "bbox": obj_box,
                    "attention_relationship": np.array([1]),
                    "spatial_relationship": np.array([2]),
                    "contacting_relationship": np.array([4])}])
    return (np.stack(boxes), np.asarray(frames, np.int64),
            np.concatenate(dist), np.concatenate(feats), gt)


def test_nonwks_sgdet_end_to_end(rng):
    boxes, frames, dist, feats, gt = _detections(rng)
    assign = sgdet_assign(boxes, frames, dist, feats)
    entry = build_infer_entry(assign, num_frames=len(gt),
                              bucket_boxes=16, bucket_rels=8, feat_dim=FEAT)
    assert entry is not None
    nb = int(np.asarray(entry.box_mask).sum())
    nr = int(np.asarray(entry.rel_mask).sum())
    assert nb == 6 and nr == 3
    # predicted labels drive the semantic pairs
    labels = np.asarray(entry.labels)
    pair = np.asarray(entry.pair_idx)[:nr]
    assert (labels[pair[:, 0]] == 1).all()
    assert (labels[pair[:, 1]] == 4).all()
    # spatial masks populated
    assert np.abs(np.asarray(entry.spatial_masks)[:nr]).sum() > 0

    model = STTran(mode="sgdet", feat_dim=FEAT)
    e = jax.tree.map(jnp.asarray, entry)
    variables = model.init({"params": jax.random.key(0),
                            "dropout": jax.random.key(1)}, e)
    pred = model.apply(variables, e, train=False)
    p = {k: np.asarray(v) for k, v in pred.items()}
    p.update(boxes=np.asarray(e.boxes), pair_idx=np.asarray(e.pair_idx),
             im_idx=np.asarray(e.im_idx), rel_mask=np.asarray(e.rel_mask),
             labels=np.asarray(e.labels), scores=np.asarray(e.scores))
    ev = SceneGraphEvaluator(mode="sgdet")
    ev.evaluate_scene_graph(gt, p)
    # oracle boxes/classes -> no-constraint top-100 recovers all GT triplets
    assert float(np.mean(ev.recall_nogc[50])) == pytest.approx(1.0)

"""DSG-DETR sgcls evaluation plumbing: host tracker -> group ids ->
DSGDETR(group_id=...) -> SceneGraphEvaluator (ref tools/test_DSG_DETR.py:85).
The VinVL feature hooks are replaced by deterministic synthetic functions;
everything else (tracker, tracklet attention, evaluator) is the real path."""

import argparse
import os
import sys

import numpy as np
import pytest

from nl_vsgg_tpu.utils.config import load_config
from tests.fixtures import load_tool as _load_tool

FEAT = 32


class _Logger:
    def info(self, msg, *a):
        pass

    warning = info


@pytest.mark.slow
def test_sgcls_eval_through_evaluator(tmp_path, monkeypatch, rng):
    from nl_vsgg_tpu.data.entry import pick_bucket
    from nl_vsgg_tpu.data.gt_entry import build_gt_entry
    from tests.fixtures import build_micro_ag

    ag = build_micro_ag(str(tmp_path), n_videos=2, n_frames=3, feat_dim=FEAT)
    cfg = load_config(None, {"mode": "sgcls", "data_path": ag,
                             "feat_dim": FEAT, "seed": 0})
    dsg = _load_tool("test_DSG_DETR")

    Wf = rng.standard_normal((4, FEAT)).astype(np.float32) * 0.1
    Wc = rng.standard_normal((FEAT, 1595)).astype(np.float32) * 0.1

    def fake_make_builder(cfg):
        def build(ds, idx, buckets):
            gt = ds.gt_annotations[idx]
            n_boxes = sum(len(f) for f in gt)
            bb = pick_bucket(buckets.max_boxes, n_boxes)
            br = pick_bucket(buckets.max_rels, n_boxes)
            feature_fn = lambda i, boxes: np.asarray(boxes, np.float32) @ Wf
            classify_fn = lambda feats: np.asarray(feats) @ Wc
            return build_gt_entry(gt, "sgcls", bb, br, feature_fn,
                                  classify_fn=classify_fn, feat_dim=FEAT,
                                  rng=np.random.default_rng(0))
        return build

    monkeypatch.setattr(dsg.base_test, "make_gt_entry_builder", fake_make_builder)
    args = argparse.Namespace(model_path=None, max_videos=0, cfg_file=None,
                              device_eval=False)
    ev = dsg.evaluate_sgcls(cfg, args, _Logger())
    # evaluator consumed every video and produced finite recalls
    rec = ev.recall[20]
    assert len(rec) > 0
    assert np.isfinite(np.mean(rec))


def test_sgcls_group_ids_cover_all_rows(rng):
    """Tracker group ids: real boxes share tracklets, padded rows get unique
    ids that can never alias a real tracklet."""
    from nl_vsgg_tpu.data.entry import empty_entry

    dsg = _load_tool("test_DSG_DETR")
    e = empty_entry(8, 8, feat_dim=FEAT)
    import dataclasses
    F, NB = 2, 4
    e = dataclasses.replace(
        e,
        boxes=np.tile(np.array([[1, 1, 50, 50]], np.float32), (8, 1)),
        box_frame=np.array([0, 0, 1, 1, 0, 0, 0, 0], np.int32),
        box_mask=np.array([1, 1, 1, 1, 0, 0, 0, 0], bool),
        labels=np.array([1, 5, 1, 5, 0, 0, 0, 0], np.int32),
        distribution=np.tile(
            np.eye(36, dtype=np.float32)[4][None], (8, 1)),
        features=rng.standard_normal((8, FEAT)).astype(np.float32),
        num_frames=np.int32(F),
    )

    class DS:
        img_info = [[480.0, 640.0, 1.0]]
        video_size = [(640, 480)]

    gid = dsg.sgcls_group_ids(e, DS(), 0)
    assert gid.shape == (8,)
    assert (gid >= 0).all()
    # padded rows never share an id with real rows
    assert not (set(gid[:NB].tolist()) & set(gid[NB:].tolist()))
    assert len(set(gid[NB:].tolist())) == 4


def test_sequence_ordinal_matches_reference_pad_sequence_layout():
    """sgcls/predcls temporal PE positions: the reference pad_sequences each
    class sequence in flat-index order and PositionalEncoding(x, None) adds
    pe[0..len-1] per token (lib/dsg_detr.py:556-560) — ordinal within the
    class sequence, NOT the sgdet unique-subject tracklet rank."""
    import jax.numpy as jnp

    from nl_vsgg_tpu.models.dsg_detr import sequence_ordinal

    obj_cls = jnp.asarray([3, 5, 3, 3, 5, 9, 0], jnp.int32)
    valid = jnp.asarray([1, 1, 1, 1, 1, 1, 0], bool)  # last row padding
    got = np.asarray(sequence_ordinal(obj_cls, valid))
    # class 3 rows at flat idx 0,2,3 -> ordinals 0,1,2; class 5 at 1,4 -> 0,1
    np.testing.assert_array_equal(got[:6], [0, 0, 1, 2, 1, 0])

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


def _fake_builder_factory(rng):
    from nl_vsgg_tpu.data.entry import POOL, pick_bucket
    from nl_vsgg_tpu.data.gt_entry import build_gt_entry

    Wf = rng.standard_normal((4, FEAT)).astype(np.float32) * 0.1
    Wc = rng.standard_normal((FEAT, 1595)).astype(np.float32) * 0.1

    def fake_make_builder(cfg):
        def build(ds, idx, buckets, return_union_fn=False):
            gt = ds.gt_annotations[idx]
            n_boxes = sum(len(f) for f in gt)
            bb = pick_bucket(buckets.max_boxes, n_boxes)
            br = pick_bucket(buckets.max_rels, n_boxes)
            feature_fn = lambda i, boxes: np.asarray(boxes, np.float32) @ Wf
            classify_fn = lambda feats: np.asarray(feats) @ Wc
            e = build_gt_entry(gt, "sgcls", bb, br, feature_fn,
                               classify_fn=classify_fn, feat_dim=FEAT,
                               rng=np.random.default_rng(0))
            if return_union_fn:
                def uf(i, boxes):
                    local = np.random.default_rng(50 + i)
                    return local.standard_normal(
                        (len(boxes), POOL, POOL, FEAT)).astype(np.float32)
                return e, uf
            return e
        return build

    return fake_make_builder


def _run_sgcls(tool_name, tmp_path, monkeypatch, rng):
    """Drive evaluate_sgcls on the micro AG; capture the rebuilt entries."""
    from nl_vsgg_tpu.data import grounding
    from tests.fixtures import build_micro_ag

    ag = build_micro_ag(str(tmp_path), n_videos=2, n_frames=3, feat_dim=FEAT)
    cfg = load_config(None, {"mode": "sgcls", "data_path": ag,
                             "feat_dim": FEAT, "seed": 0})
    tool = _load_tool(tool_name)
    base = tool if tool_name == "test_STTran" else tool.base_test
    monkeypatch.setattr(base, "make_gt_entry_builder", _fake_builder_factory(rng))

    captured = []
    real_e2p = grounding.entry_to_eval_pred

    def spy(entry, pred):
        captured.append((entry, pred))
        return real_e2p(entry, pred)

    monkeypatch.setattr(grounding, "entry_to_eval_pred", spy)
    args = argparse.Namespace(model_path=None, max_videos=0, cfg_file=None,
                              device_eval=False)
    ev = tool.evaluate_sgcls(cfg, args, _Logger())
    return ev, captured


@pytest.mark.slow
@pytest.mark.parametrize("tool_name", ["test_STTran", "test_DSG_DETR"])
def test_sgcls_eval_reassigns_through_evaluator(tool_name, tmp_path,
                                                monkeypatch, rng):
    """The sgcls eval flow must feed the evaluator REBUILT entries: labels
    reassigned by the classifier (lib/sttran.py:93-170), one person per
    frame, pairs person->object over predicted labels, nonzero union
    features at the new union boxes."""
    ev, captured = _run_sgcls(tool_name, tmp_path, monkeypatch, rng)
    rec = ev.recall[20]
    assert len(rec) > 0 and np.isfinite(np.mean(rec))
    assert captured, "evaluator never saw a rebuilt entry"
    for entry, pred in captured:
        nb = int(np.asarray(entry.box_mask).sum())
        nr = int(np.asarray(entry.rel_mask).sum())
        labels = np.asarray(entry.labels)[:nb]
        frames = np.asarray(entry.box_frame)[:nb]
        pair = np.asarray(entry.pair_idx)[:nr]
        # exactly one person per frame, chosen by the classifier
        for f in np.unique(frames):
            assert (labels[frames == f] == 1).sum() == 1
        # pairs person -> predicted-object
        assert (labels[pair[:, 0]] == 1).all()
        assert (labels[pair[:, 1]] != 1).all()
        # union features re-extracted at the new pairs (stage-2 entry, not
        # the zero-union stage-1 GT entry)
        assert np.abs(np.asarray(entry.union_feat)[:nr]).sum() > 0
        # scores are the assigned softmax scores (<1), not GT ones
        assert (np.asarray(entry.scores)[:nb] < 1.0).all()


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

"""Evaluate a trained STTran checkpoint on the AG test split.

Same CLI as the reference tools/test_STTran.py (--cfg, --model_path, :10-21):
loads an Orbax checkpoint (full TrainState), runs the grounding + model over
AG_Test, prints R@K / mR@K.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

from nl_vsgg_tpu.data import schema
from nl_vsgg_tpu.data.action_genome import AGTest
from nl_vsgg_tpu.eval import SceneGraphEvaluator
from nl_vsgg_tpu.train import create_train_state, make_eval_step, make_optimizer
from nl_vsgg_tpu.utils.checkpoint import restore_checkpoint
from nl_vsgg_tpu.utils.config import load_config
from nl_vsgg_tpu.utils.logging import setup_logger

from train_STTran import (build_model, evaluate_epoch, ground_video,  # noqa: E402
                          make_union_provider)


def make_gt_entry_builder(cfg):
    """PredCLS/SGCLS evaluation needs VinVL features at GT boxes — build the
    hooks from the converted checkpoint (cfg.ckpt)."""
    assert cfg.ckpt and os.path.isfile(str(cfg.ckpt)), \
        f"mode={cfg.mode} needs a converted VinVL checkpoint (cfg.ckpt)"
    import cv2
    from nl_vsgg_tpu.data.gt_entry import build_gt_entry
    from nl_vsgg_tpu.data.entry import pick_bucket
    from nl_vsgg_tpu.detector.attr_rcnn import AttrRCNNJax
    from nl_vsgg_tpu.detector.convert import load_checkpoint
    det = AttrRCNNJax(load_checkpoint(str(cfg.ckpt)))

    def classify(feats):
        p = det.variables["params"]["box_head"]["predictor"]["cls_score"]
        return feats @ np.asarray(p["kernel"]) + np.asarray(p["bias"])

    def build(ds, idx, buckets, return_union_fn=False):
        frames = [cv2.imread(os.path.join(cfg.data_path, "frames", f))
                  for f in ds.video_list[idx]]
        uf = det.make_union_feature_fn(frames)

        def feature_fn(i, boxes):
            return det.extract_box_features(frames[i], boxes).mean((-3, -2))

        gt = ds.gt_annotations[idx]
        n_boxes = sum(len(f) for f in gt)
        bb = pick_bucket(buckets.max_boxes, n_boxes)
        br = pick_bucket(buckets.max_rels, n_boxes)
        e = build_gt_entry(gt, cfg.mode, bb, br, feature_fn,
                           union_feature_fn=uf if cfg.mode == "predcls" else None,
                           classify_fn=classify if cfg.mode == "sgcls" else None,
                           feat_dim=cfg.feat_dim,
                           compute_spatial_masks=not cfg.device_spatial_masks)
        if return_union_fn:
            # sgcls rebuilds pairs after label reassignment and re-extracts
            # union features at the NEW union boxes (lib/sttran.py:142-170)
            return e, uf
        return e

    return build


def evaluate_sgcls(cfg, args, logger, build_model_fn=build_model,
                   group_id_fn=None):
    """SGCLS evaluation with the reference's eval-time reassignment.

    The reference's sgcls test branch (lib/sttran.py:93-170, mirrored at
    lib/dsg_detr.py:185-275) runs INSIDE the model forward: softmax the
    37-way classifier logits, pick the most-human box per frame, greedily
    resolve duplicate classes, rebuild person->object pairs from the
    PREDICTED labels, re-extract union features at the new union boxes and
    re-rasterize the spatial masks, then feed the relation head. Here that
    is a two-stage flow around the same jit model:

      stage 1: model forward on the GT-box entry -> 37-way logits
      host:    models/sgcls_infer.sgcls_assign (golden-tested) -> new
               labels/scores/pairs; data/infer_entry.build_infer_entry packs
               them with re-extracted union features + fresh masks
      stage 2: model forward on the rebuilt entry -> relation distributions

    The evaluator consumes the rebuilt entry's pred_labels/pred_scores —
    exactly the reference's mutated-entry semantics.

    `group_id_fn(entry, ds, idx) -> (n_boxes,) int32` is the DSG-DETR
    tracker hook (tools/test_DSG_DETR.py): the box table is identical in
    both stages, so one tracker pass serves both. NOTE the reference's own
    DSG-DETR sgcls eval branch is unrunnable as written — it overwrites
    entry['features'] with the 2376-d encoder output and then feeds its
    2048-in subj_fc (lib/dsg_detr.py:214,518) — so for DSG-DETR this flow
    is the documented repair: RoI features are kept for the relation head.
    """
    import jax.numpy as jnp

    from nl_vsgg_tpu.data.grounding import entry_to_eval_pred
    from nl_vsgg_tpu.data.infer_entry import build_infer_entry
    from nl_vsgg_tpu.models.sgcls_infer import sgcls_assign

    tax = schema.load_taxonomy()
    ds_test = AGTest(cfg.data_path if cfg.data_path.endswith("annotations")
                     else os.path.join(cfg.data_path, "annotations"))
    logger.info(f"test videos: {len(ds_test)}")
    model = build_model_fn(cfg, tax)
    builder = make_gt_entry_builder(cfg)

    sample_i, sample, sample_uf = None, None, None
    for i in range(len(ds_test)):
        sample, sample_uf = builder(ds_test, i, cfg.buckets, return_union_fn=True)
        if sample is not None:
            sample_i = i
            break
    assert sample is not None
    state, _ = create_train_state(model, sample, jax.random.key(cfg.seed),
                                  tx=make_optimizer(cfg.lr))
    if args.model_path:
        state = restore_checkpoint(args.model_path, state)

    if group_id_fn is None:
        @jax.jit
        def _run(state, e):
            return model.apply({"params": state.params,
                                "batch_stats": state.batch_stats}, e, train=False)
        run = lambda st, e, gid: _run(st, e)
    else:
        @jax.jit
        def _run_g(state, e, gid):
            return model.apply({"params": state.params,
                                "batch_stats": state.batch_stats},
                               e, train=False, group_id=gid)
        run = _run_g

    evaluator = SceneGraphEvaluator(mode="sgcls", taxonomy=tax)
    n = len(ds_test) if not args.max_videos else min(args.max_videos, len(ds_test))
    for i in range(n):
        gt = ds_test.gt_annotations[i]
        e, uf = ((sample, sample_uf) if i == sample_i
                 else builder(ds_test, i, cfg.buckets, return_union_fn=True))
        if e is None:
            evaluator.evaluate_scene_graph(gt, {})
            continue
        gid = (jnp.asarray(group_id_fn(e, ds_test, i))
               if group_id_fn is not None else None)
        stage1 = run(state, jax.tree.map(jnp.asarray, e), gid)
        nb = int(np.asarray(e.box_mask).sum())
        assign = sgcls_assign(np.asarray(stage1["distribution"])[:nb],
                              np.asarray(e.box_frame)[:nb])
        assign.update(boxes=np.asarray(e.boxes)[:nb],
                      box_frame=np.asarray(e.box_frame)[:nb],
                      features=np.asarray(e.features)[:nb])
        e2 = build_infer_entry(
            assign, int(e.num_frames), e.n_boxes, e.n_rels,
            union_feat_fn=uf, feat_dim=cfg.feat_dim,
            compute_spatial_masks=not cfg.device_spatial_masks)
        if e2 is None:  # every box classified person -> no pairs
            evaluator.evaluate_scene_graph(gt, {})
            continue
        pred = run(state, jax.tree.map(jnp.asarray, e2), gid)
        evaluator.evaluate_scene_graph(
            gt, entry_to_eval_pred(e2, jax.device_get(pred)))
    evaluator.calculate_mean_recall()
    evaluator.print_stats(logger)
    return evaluator


def main(argv=None, build_model_fn=build_model):
    """`build_model_fn` lets tools/test_DSG_DETR.py run the same loop with
    its model builder (the reference duplicates the whole file)."""
    p = argparse.ArgumentParser(description="relation-model evaluation")
    p.add_argument("--cfg", dest="cfg_file", default=None)
    p.add_argument("--model_path", required=True, help="Orbax checkpoint dir")
    p.add_argument("--max_videos", type=int, default=0)
    p.add_argument("--device_eval", action="store_true",
                   help="additionally score R@K on-device (fast path; the "
                        "host evaluator remains the reported source of truth)")
    args = p.parse_args(argv)

    cfg = load_config(args.cfg_file)
    logger = setup_logger()
    if cfg.mode == "sgcls":
        # classifier-reassignment flow (two model stages + host rebuild)
        return evaluate_sgcls(cfg, args, logger, build_model_fn=build_model_fn)
    tax = schema.load_taxonomy()
    ds_test = AGTest(cfg.data_path if cfg.data_path.endswith("annotations")
                     else os.path.join(cfg.data_path, "annotations"))
    logger.info(f"test videos: {len(ds_test)}")

    model = build_model_fn(cfg, tax)
    zero_union = False
    if cfg.mode == "predcls":
        builder = make_gt_entry_builder(cfg)
        get_entry = lambda i: builder(ds_test, i, cfg.buckets)
    else:
        # same union-feature wiring as training — evaluating with zeroed
        # union features against a checkpoint trained on real ones silently
        # corrupts R@K (train/eval feature skew)
        union_provider = make_union_provider(cfg, logger)
        zero_union = union_provider is None
        get_entry = lambda i: ground_video(ds_test, i, cfg, False, cfg.buckets,
                                           union_provider=union_provider)
    sample = None
    for i in range(len(ds_test)):
        sample = get_entry(i)
        if sample is not None:
            break
    assert sample is not None
    state, _ = create_train_state(model, sample, jax.random.key(cfg.seed),
                                  tx=make_optimizer(cfg.lr))
    state = restore_checkpoint(args.model_path, state)
    eval_step = jax.jit(make_eval_step(model))

    # same streaming machinery as the per-epoch train eval: prefetch workers
    # ground ahead of the device, same-bucket videos batch into one jit call,
    # and host scoring double-buffers against device compute
    evaluator = SceneGraphEvaluator(mode=cfg.mode, taxonomy=tax)
    device_recalls: list | None = [] if args.device_eval else None
    n = len(ds_test) if not args.max_videos else min(args.max_videos, len(ds_test))
    evaluate_epoch(cfg, tax, ds_test, n, get_entry, eval_step, state,
                   evaluator=evaluator, device_recalls=device_recalls,
                   zero_union=zero_union)
    evaluator.calculate_mean_recall()
    evaluator.print_stats(logger)
    if args.device_eval and device_recalls:
        for name in ("recall", "recall_nogc", "semi"):
            r = np.concatenate([d[name] for d in device_recalls])
            logger.info("device %s: R@10 %.4f R@20 %.4f R@50 %.4f"
                        % (name, *r.mean(0)))
        dropped = sum(d.get("gt_dropped", 0) for d in device_recalls)
        if dropped:
            logger.warning(
                f"device R@K excluded {dropped} GT relations past the "
                f"frame/relation buckets — the host numbers above are the "
                f"source of truth (raise f_bucket/g_max to compare)")
    return evaluator


if __name__ == "__main__":
    main()

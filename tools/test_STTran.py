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

    def build(ds, idx, buckets):
        frames = [cv2.imread(os.path.join(cfg.data_path, "frames", f))
                  for f in ds.video_list[idx]]
        uf = det.make_union_feature_fn(frames)

        def feature_fn(i, boxes):
            return det.extract_box_features(frames[i], boxes).mean((-3, -2))

        gt = ds.gt_annotations[idx]
        n_boxes = sum(len(f) for f in gt)
        bb = pick_bucket(buckets.max_boxes, n_boxes)
        br = pick_bucket(buckets.max_rels, n_boxes)
        return build_gt_entry(gt, cfg.mode, bb, br, feature_fn,
                              union_feature_fn=uf if cfg.mode == "predcls" else None,
                              classify_fn=classify if cfg.mode == "sgcls" else None,
                              feat_dim=cfg.feat_dim)

    return build


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
    tax = schema.load_taxonomy()
    ds_test = AGTest(cfg.data_path if cfg.data_path.endswith("annotations")
                     else os.path.join(cfg.data_path, "annotations"))
    logger.info(f"test videos: {len(ds_test)}")

    model = build_model_fn(cfg, tax)
    zero_union = False
    if cfg.mode in ("predcls", "sgcls"):
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


if __name__ == "__main__":
    main()

"""Evaluate a trained DSG-DETR checkpoint on the AG test split
(reference tools/test_DSG_DETR.py interface).

sgdet (weak supervision, the shipped path) delegates to the shared test loop.
sgcls runs the reference's tracker plumbing (ref tools/test_DSG_DETR.py:85,
lib/track.py:154-243): GT-box entries get VinVL features, the host tracker
clusters boxes into tracklets, and the cluster ids drive the tracklet
attention via DSGDETR(group_id=...).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

import test_STTran as base_test
from train_DSG_DETR import build_model


def sgcls_group_ids(entry, ds, idx) -> np.ndarray:
    """Host tracker -> per-box tracklet ids for one GT entry."""
    from nl_vsgg_tpu.models.track import clusters_to_groups, track_video

    nb = int(np.asarray(entry.box_mask).sum())
    info = ds.img_info[idx]
    if info is not None:
        h, w, s = float(info[0]), float(info[1]), float(info[2])
        # the reference passes (img_info[:2]/scale) and get_sequence unpacks
        # it as `w, h = shape` — preserve that order quirk (lib/track.py:154)
        im_size = (h / s, w / s)
    else:
        vs = ds.video_size[idx]  # (w, h)
        im_size = (float(vs[1]), float(vs[0]))
    clusters = track_video(
        "sgcls", np.asarray(entry.box_frame)[:nb], np.asarray(entry.boxes)[:nb],
        np.asarray(entry.features)[:nb], np.asarray(entry.distribution)[:nb],
        np.asarray(entry.labels)[:nb],
        frame_keys=list(range(int(entry.num_frames))), im_size=im_size)
    gid = np.full(entry.n_boxes, -1, np.int32)
    gid[:nb] = clusters_to_groups(clusters, nb)
    # padded rows get unique ids past every real tracklet so the tracklet
    # attention mask can never join them to real boxes
    pad_rows = np.where(gid < 0)[0]
    gid[pad_rows] = gid[:nb].max(initial=-1) + 1 + np.arange(len(pad_rows))
    return gid


def evaluate_sgcls(cfg, args, logger):
    from nl_vsgg_tpu.data import schema
    from nl_vsgg_tpu.data.action_genome import AGTest
    from nl_vsgg_tpu.eval import SceneGraphEvaluator
    from nl_vsgg_tpu.train import create_train_state, make_optimizer
    from nl_vsgg_tpu.utils.checkpoint import restore_checkpoint

    tax = schema.load_taxonomy()
    ds_test = AGTest(cfg.data_path if cfg.data_path.endswith("annotations")
                     else os.path.join(cfg.data_path, "annotations"))
    logger.info(f"test videos: {len(ds_test)}")
    model = build_model(cfg, tax)
    builder = base_test.make_gt_entry_builder(cfg)

    sample_i, sample = None, None
    for i in range(len(ds_test)):
        sample = builder(ds_test, i, cfg.buckets)
        if sample is not None:
            sample_i = i
            break
    assert sample is not None
    state, _ = create_train_state(model, sample, jax.random.key(cfg.seed),
                                  tx=make_optimizer(cfg.lr))
    if args.model_path:
        state = restore_checkpoint(args.model_path, state)

    @jax.jit
    def eval_one(state, e, gid):
        return model.apply({"params": state.params,
                            "batch_stats": state.batch_stats},
                           e, train=False, group_id=gid)

    from nl_vsgg_tpu.data.grounding import entry_to_eval_pred

    evaluator = SceneGraphEvaluator(mode="sgcls", taxonomy=tax)
    n = len(ds_test) if not args.max_videos else min(args.max_videos, len(ds_test))
    for i in range(n):
        gt = ds_test.gt_annotations[i]
        # the init sample already paid this video's full feature extraction
        e = sample if i == sample_i else builder(ds_test, i, cfg.buckets)
        if e is None:
            evaluator.evaluate_scene_graph(gt, {})
            continue
        gid = sgcls_group_ids(e, ds_test, i)
        e_dev = jax.tree.map(jnp.asarray, e)
        pred = eval_one(state, e_dev, jnp.asarray(gid))
        pd = entry_to_eval_pred(e, pred)
        evaluator.evaluate_scene_graph(gt, pd)
    evaluator.calculate_mean_recall()
    evaluator.print_stats(logger)
    return evaluator


def main():
    from nl_vsgg_tpu.utils.config import load_config
    from nl_vsgg_tpu.utils.logging import setup_logger

    p = argparse.ArgumentParser(description="DSG-DETR evaluation")
    p.add_argument("--cfg", dest="cfg_file", default=None)
    p.add_argument("--model_path", default=None, help="Orbax checkpoint dir")
    p.add_argument("--max_videos", type=int, default=0)
    p.add_argument("--device_eval", action="store_true")
    args = p.parse_args()
    cfg = load_config(args.cfg_file)

    if cfg.mode == "sgcls":
        evaluate_sgcls(cfg, args, setup_logger())
        return
    # sgdet/predcls: shared streaming loop, parameterized by the model
    # builder (no monkey-patching; the reference duplicates the whole file)
    if not args.model_path:
        p.error("--model_path is required for sgdet/predcls evaluation")
    argv = [*(["--cfg", args.cfg_file] if args.cfg_file else []),
            "--model_path", args.model_path,
            *(["--max_videos", str(args.max_videos)] if args.max_videos else []),
            *(["--device_eval"] if args.device_eval else [])]
    base_test.main(argv, build_model_fn=build_model)


if __name__ == "__main__":
    main()

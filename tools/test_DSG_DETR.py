"""Evaluate a trained DSG-DETR checkpoint on the AG test split
(reference tools/test_DSG_DETR.py interface).

sgdet (weak supervision, the shipped path) delegates to the shared test loop.
sgcls runs the reference's tracker plumbing (ref tools/test_DSG_DETR.py:85,
lib/track.py:154-243): GT-box entries get VinVL features, the host tracker
clusters boxes into tracklets, and the cluster ids drive the tracklet
attention via DSGDETR(group_id=...) — through the shared two-stage
classifier-reassignment eval flow (test_STTran.evaluate_sgcls).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

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
    """Shared two-stage sgcls flow (classifier -> host reassignment ->
    rebuilt relation pass, base_test.evaluate_sgcls) with the DSG-DETR
    tracker supplying tracklet group ids to BOTH stages (same box table)."""
    return base_test.evaluate_sgcls(cfg, args, logger,
                                    build_model_fn=build_model,
                                    group_id_fn=sgcls_group_ids)


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

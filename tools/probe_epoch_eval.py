"""Probe: per-video epoch-eval scoring cost — host numpy vs the on-device
scorer that `device_eval_promote` swaps in after burn-in.

Generates AG-scale synthetic videos (32 frames, 3 objs/frame -> ~96
relations) and times, over the SAME (gt, pred) pairs:

  host    — SceneGraphEvaluator.evaluate_scene_graph (the path promotion
            removes for every post-burn-in video)
  device  — eval/recall_jax.device_eval_video (pack + upload + all three
            R@K variants + fetch). On this tunneled chip the per-video
            fetch adds the fixed ~25-45 ms round trip 3+ times per video,
            so the wall number is tunnel-dominated; the kernel itself is
            0.204 ms/video (BASELINE.md, differenced).
  batched — eval/recall_jax.device_eval_batch: the whole batch scored in
            ONE device call with ONE packed fetch (VERDICT r3 #3) — the
            fixed round-trip amortizes across B videos. This is the form
            evaluate_epoch uses under device_eval/promotion.

Usage: python tools/probe_epoch_eval.py [--videos N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--videos", type=int, default=24)
    p.add_argument("--frames", type=int, default=32)
    p.add_argument("--batch", type=int, default=12)
    args = p.parse_args()

    from nl_vsgg_tpu.eval import SceneGraphEvaluator
    from nl_vsgg_tpu.eval.recall_jax import device_eval_video
    from tests.test_eval_recall import _random_video

    rng = np.random.default_rng(0)
    vids = [_random_video(rng, n_frames=args.frames, n_objs=3)
            for _ in range(args.videos)]

    # entries for device_eval_video need pair_idx/im_idx/rel_mask/boxes
    class _E:
        def __init__(self, pred):
            self.pair_idx = np.asarray(pred["pair_idx"], np.int32)
            self.im_idx = np.asarray(pred["im_idx"], np.int32)
            self.rel_mask = np.ones(len(self.im_idx), bool)
            self.boxes = np.asarray(pred["boxes"])[:, 1:].astype(np.float32)

    # --- host path ---
    ev = SceneGraphEvaluator(mode="sgdet")
    for gt, pred in vids[:2]:
        ev.evaluate_scene_graph(gt, pred)  # warm caches
    t0 = time.perf_counter()
    for gt, pred in vids:
        ev.evaluate_scene_graph(gt, pred)
    host_ms = (time.perf_counter() - t0) / args.videos * 1e3

    # --- device path, per video (includes per-video pack/upload/fetch) ---
    ev2 = SceneGraphEvaluator(mode="sgdet")
    for gt, pred in vids[:2]:
        device_eval_video(_E(pred), pred, gt, ev2, f_bucket=args.frames)
    t0 = time.perf_counter()
    for gt, pred in vids:
        device_eval_video(_E(pred), pred, gt, ev2, f_bucket=args.frames)
    dev_ms = (time.perf_counter() - t0) / args.videos * 1e3

    # --- device path, batch-packed (ONE call + ONE fetch per batch —
    #     the form evaluate_epoch actually uses, VERDICT r3 #3) ---
    from nl_vsgg_tpu.eval.recall_jax import device_eval_batch
    B = args.batch
    ev3 = SceneGraphEvaluator(mode="sgdet")

    def run_batched():
        for s in range(0, len(vids), B):
            chunk = vids[s:s + B]
            device_eval_batch([_E(p) for _, p in chunk],
                              [p for _, p in chunk],
                              [g for g, _ in chunk], ev3,
                              f_bucket=args.frames)
    run_batched()  # compile
    t0 = time.perf_counter()
    run_batched()
    batch_ms = (time.perf_counter() - t0) / args.videos * 1e3

    print(f"videos={args.videos} frames={args.frames} batch={B}")
    print(f"host evaluate_scene_graph : {host_ms:7.2f} ms/video "
          f"(removed per post-burn-in video under device_eval_promote)")
    print(f"device_eval_video (wall)  : {dev_ms:7.2f} ms/video "
          f"(3+ tunnel round-trips per video)")
    print(f"device_eval_batch (wall)  : {batch_ms:7.2f} ms/video "
          f"(~2 round-trips per {B}-video batch)")
    print(f"-> at real-AG scale (~1750 test videos/epoch) promotion with "
          f"batched scoring removes ~{(host_ms - batch_ms) * 1750 / 1e3:.0f} s "
          f"NET per epoch on this link "
          f"(gross host-scoring removal ~{host_ms * 1750 / 1e3:.0f} s)")


if __name__ == "__main__":
    main()

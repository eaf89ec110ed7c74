"""Recommend padding buckets (cfg.buckets) from a dataset scan.

Every video pads to the smallest bucket that fits it (data/entry.py
pick_bucket); the last bucket TRUNCATES oversized videos (label loss,
counted by the train loop) and oversized buckets waste padded compute.
The reference has no equivalent — its batch is one ragged video — but for
the TPU build the bucket ladder is a first-order cost knob
(ROADMAP: "tune bucket sizes to the real box/rel distributions").

This tool scans per-video box counts CHEAPLY — `feat.npy` holds (N, 2048)
RoI features, so N comes from the .npy header without reading data — joins
the same frame lists the dataset layer uses (triplets_LLM4SGG.pkl), and
solves the K-bucket 1-D partition that minimizes total padded cost by
dynamic programming. Cost per video = b + b^2/alpha, the step's shape:
projections/FFN are linear in the padded relation count b, attention is
quadratic (alpha ~ model width / attention share; the default 256 matches
the measured b64 train-step profile where the two terms are comparable at
b~128-256).

Prints a YAML `buckets:` block (load_config parses it directly) plus
per-bucket occupancy, padded-waste %, and truncation counts vs the
current config.

Usage:
  python tools/tune_buckets.py --cfg configs/nl_vsgg_config.yml
  python tools/tune_buckets.py --features_dir d --frame_lists t.pkl -k 4
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def npy_rows(path: str) -> int:
    """Row count from a .npy header (no data read)."""
    with open(path, "rb") as f:
        version = np.lib.format.read_magic(f)
        reader = (np.lib.format.read_array_header_1_0 if version == (1, 0)
                  else np.lib.format.read_array_header_2_0)
        shape, _, _ = reader(f)
    return int(shape[0])


def scan_video_counts(features_dir: str, frame_lists: dict) -> dict[str, tuple[int, int]]:
    """{video: (n_boxes_hint, n_frames)} — the same hint ground_video uses
    (total detections across the video's frames)."""
    out = {}
    for vid, meta in frame_lists.items():
        frames = meta["frame_list"] if isinstance(meta, dict) else meta
        total, got = 0, 0
        for fr in frames:
            p = os.path.join(features_dir, vid, fr, "feat.npy")
            if os.path.isfile(p):
                total += npy_rows(p)
                got += 1
        if got:
            out[vid] = (total, got)
    return out


def optimal_buckets(counts: np.ndarray, k: int, alpha: float = 256.0,
                    align: int = 8) -> list[int]:
    """K bucket edges minimizing sum over videos of cost(bucket(video)),
    cost(b) = b + b*b/alpha. Edges are the aligned-up data values (classic
    1-D partition DP over unique counts, O(K * U^2))."""
    counts = np.asarray(sorted(counts))
    up = lambda v: int(-(-int(v) // align) * align)
    uniq = sorted({up(v) for v in counts})
    U = len(uniq)
    # videos covered by edge u_j but not u_{j-1}: weight per segment
    n_le = np.searchsorted(counts, uniq, side="right")  # videos <= uniq[j]
    cost = lambda b: b + b * b / alpha
    INF = float("inf")
    dp = [[INF] * U for _ in range(k + 1)]
    arg = [[-1] * U for _ in range(k + 1)]
    for j in range(U):
        dp[1][j] = n_le[j] * cost(uniq[j])
    for kk in range(2, k + 1):
        for j in range(kk - 1, U):
            best, bi = INF, -1
            for i in range(kk - 2, j):
                c = dp[kk - 1][i] + (n_le[j] - n_le[i]) * cost(uniq[j])
                if c < best:
                    best, bi = c, i
            dp[kk][j], arg[kk][j] = best, bi
    # the last edge must cover the max; fewer buckets may already be optimal
    best_k = min(range(1, k + 1), key=lambda kk: dp[kk][U - 1])
    edges, j = [], U - 1
    for kk in range(best_k, 0, -1):
        edges.append(uniq[j])
        j = arg[kk][j]
    return sorted(edges)


def waste(counts: np.ndarray, buckets: list[int], alpha: float) -> tuple[float, int]:
    """(padded-cost overhead vs exact shapes, #videos truncated)."""
    cost = lambda b: b + b * b / alpha
    exact = sum(cost(c) for c in counts)
    padded, trunc = 0.0, 0
    for c in counts:
        fit = [b for b in buckets if c <= b]
        if fit:
            padded += cost(fit[0])
        else:
            padded += cost(buckets[-1])
            trunc += 1
    return padded / max(exact, 1e-9) - 1.0, trunc


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--cfg", dest="cfg_file", default=None)
    p.add_argument("--features_dir", default=None,
                   help="frame_features root (default: cfg.frame_features_path)")
    p.add_argument("--frame_lists", default=None,
                   help="triplets_LLM4SGG.pkl (default: <data_path>/triplets_LLM4SGG.pkl)")
    p.add_argument("-k", "--max_buckets", type=int, default=5)
    p.add_argument("--alpha", type=float, default=256.0,
                   help="quadratic-cost scale: cost(b) = b + b^2/alpha")
    p.add_argument("--align", type=int, default=8,
                   help="round bucket edges up to this multiple")
    args = p.parse_args(argv)

    from nl_vsgg_tpu.utils.config import load_config
    cfg = load_config(args.cfg_file)
    features_dir = args.features_dir or cfg.frame_features_path
    frame_lists_path = args.frame_lists or os.path.join(
        cfg.data_path, "triplets_LLM4SGG.pkl")
    with open(frame_lists_path, "rb") as f:
        frame_lists = pickle.load(f)

    stats = scan_video_counts(features_dir, frame_lists)
    if not stats:
        raise SystemExit(f"no videos found under {features_dir}")
    boxes = np.asarray([b for b, _ in stats.values()])
    frames = np.asarray([f for _, f in stats.values()])

    print(f"# scanned {len(stats)} videos: boxes p50/p90/p99/max = "
          f"{np.percentile(boxes, 50):.0f}/{np.percentile(boxes, 90):.0f}/"
          f"{np.percentile(boxes, 99):.0f}/{boxes.max()}; frames max {frames.max()}")

    bb = optimal_buckets(boxes, args.max_buckets, args.alpha, args.align)
    # the runtime selects BOTH buckets with the same pre-grounding BOX-count
    # hint (tools/train_STTran.py::ground_video — relation counts are unknown
    # before grounding, and boxes >= rels makes the box hint truncation-safe),
    # so the rel ladder must be optimized against the box distribution too;
    # edges placed on a rels~boxes-frames distribution would be dead at
    # runtime and the DP's occupancy numbers fiction
    br = optimal_buckets(boxes, args.max_buckets, args.alpha, args.align)
    w_new, t_new = waste(boxes, bb, args.alpha)
    w_old, t_old = waste(boxes, list(cfg.buckets.max_boxes), args.alpha)
    print(f"# padded-cost overhead (boxes): current buckets "
          f"{list(cfg.buckets.max_boxes)} = +{w_old:.1%} "
          f"({t_old} videos truncated); tuned = +{w_new:.1%} ({t_new} truncated)")
    print("# paste into your config yaml:")
    print("buckets:")
    print(f"  max_boxes: {bb}")
    print(f"  max_rels: {br}")
    print(f"  max_frames: {sorted(set(int(-(-int(f) // args.align) * args.align) for f in (np.percentile(frames, 50), frames.max())))}")
    return bb, br


if __name__ == "__main__":
    main()

"""Export scene graphs for unannotated videos (batch serving CLI).

The reference has no deployment entry point: its sgdet "inference" path is
only ever driven by the evaluator over annotated test videos
(tools/test_STTran.py:75-92). This tool closes that gap — it runs the same
weak-supervision sgdet pipeline (cached VinVL detections -> OI->AG class
mapping -> Entry -> STTran/DSG-DETR -> relation distributions) over videos
WITHOUT any annotations and writes one JSON scene graph per video.

The grounding engine already supports annotation-free operation: in test
mode the OI->AG mapping keeps every mapped class and pairs the person with
every object (lib/assign_pseudo_label.py:1290-1292 — the `is_train=False`
branch never reads GT), so an empty per-frame GT list yields the full
detector-driven graph.

Usage:
    python tools/predict.py --cfg configs/nl_vsgg_config.yml \
        --model_path out/ckpt --features_dir data/frame_features \
        [--videos vid1.mp4 vid2.mp4] [--out scene_graphs.jsonl] \
        [--topk 100] [--dsg_detr]

Input layout: features_dir/{video}/{frame}/dets.npy + feat.npy — the cache
written by `tools/preprocess.py features` (reference
NL-VSGG/data_preprocess/extract_bbox_features_ag.py:108-120).

Throughput: grounding runs on worker threads and videos batch per shape
bucket through one jitted eval step (--batch, default 16) — the JSONL line
order therefore follows batch completion, not input order; each line is
self-identifying via its "video" field.

Output: JSONL, one object per video:
    {"video", "num_frames", "objects": [{"frame", "box", "label", "score"}],
     "triplets": [{"frame", "subject", "object", "predicate", "score"}]}
`subject`/`object` index into `objects`; triplets carry all three predicate
heads (attention argmax + sigmoided spatial/contacting), ranked by
score * subj_score * obj_score (the no-graph-constraint ordering,
lib/evaluation_recall.py:321-353), capped at --topk per video.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from nl_vsgg_tpu.data import schema
from nl_vsgg_tpu.train import create_train_state, make_eval_step, make_optimizer, place_entries
from nl_vsgg_tpu.utils.checkpoint import restore_checkpoint
from nl_vsgg_tpu.utils.config import load_config
from nl_vsgg_tpu.utils.logging import setup_logger

from train_STTran import build_model, ground_video, make_union_provider  # noqa: E402


class UnlabeledVideos:
    """Duck-typed stand-in for AGTest over bare feature directories: the
    `video_list` / `gt_annotations` surface that ground_video and
    make_union_provider expect, with empty per-frame GT."""

    def __init__(self, features_root: str, videos: list[str] | None = None):
        vids = videos or sorted(
            d for d in os.listdir(features_root)
            if os.path.isdir(os.path.join(features_root, d)))
        if not vids:
            raise SystemExit(f"no video directories under {features_root}")
        self.video_ids = []
        self.video_list = []
        self.skipped: list[str] = []
        for vid in vids:
            vdir = os.path.join(features_root, vid)
            frames = sorted(d for d in os.listdir(vdir)
                            if os.path.isdir(os.path.join(vdir, d)))
            if not frames:
                # one stray/empty directory must not abort a batch export —
                # the tool's fault isolation is per-video everywhere else
                self.skipped.append(vid)
                continue
            self.video_ids.append(vid)
            self.video_list.append([os.path.join(vid, f) for f in frames])
        if not self.video_ids:
            raise SystemExit(f"no video with frame directories under "
                             f"{features_root}")
        self.gt_annotations = [[[] for _ in fl] for fl in self.video_list]

    def __len__(self):
        return len(self.video_list)


def scene_graph_json(video_id: str, entry, pred: dict, tax, topk: int) -> dict:
    """Padded Entry + model outputs -> JSON-serializable scene graph."""
    box_mask = np.asarray(entry.box_mask)
    rel_mask = np.asarray(entry.rel_mask)
    boxes = np.asarray(entry.boxes)
    labels = np.asarray(entry.labels)
    scores = np.asarray(entry.scores)
    box_frame = np.asarray(entry.box_frame)
    pair = np.asarray(entry.pair_idx)
    im_idx = np.asarray(entry.im_idx)

    n_boxes = int(box_mask.sum())
    objects = [{
        "frame": int(box_frame[i]),
        "box": [round(float(x), 2) for x in boxes[i]],
        "label": tax.object_classes[int(labels[i])],
        "score": round(float(scores[i]), 4),
    } for i in range(n_boxes)]

    # host numpy softmax: jax.nn.softmax here would round-trip through the
    # (tunneled) device per video, dwarfing the batched model call
    a = np.asarray(pred["attention_distribution"], np.float64)
    a = np.exp(a - a.max(axis=-1, keepdims=True))
    att = a / a.sum(axis=-1, keepdims=True)
    sp = np.asarray(pred["spatial_distribution"])
    con = np.asarray(pred["contacting_distribution"])

    triplets = []
    for r in range(len(pair)):
        if not rel_mask[r]:
            continue
        s, o = int(pair[r, 0]), int(pair[r, 1])
        pair_score = float(scores[s]) * float(scores[o])
        a = int(att[r].argmax())
        triplets.append((float(att[r, a]) * pair_score, r, s, o,
                         tax.attention_relationships[a], float(att[r, a])))
        for j, name in enumerate(tax.spatial_relationships):
            triplets.append((float(sp[r, j]) * pair_score, r, s, o,
                             name, float(sp[r, j])))
        for j, name in enumerate(tax.contacting_relationships):
            triplets.append((float(con[r, j]) * pair_score, r, s, o,
                             name, float(con[r, j])))
    triplets.sort(key=lambda t: -t[0])
    out_trip = [{
        "frame": int(im_idx[r]), "subject": s, "object": o,
        "predicate": name, "score": round(rel_score, 4),
        "ranking_score": round(rank, 6),
    } for rank, r, s, o, name, rel_score in triplets[:topk]]

    return {"video": video_id, "num_frames": int(entry.num_frames),
            "objects": objects, "triplets": out_trip}


def main():
    p = argparse.ArgumentParser(description="scene-graph export (sgdet)")
    p.add_argument("--cfg", dest="cfg_file", default=None)
    p.add_argument("--model_path", required=True, help="Orbax checkpoint dir")
    p.add_argument("--features_dir", required=True,
                   help="root of cached VinVL features ({video}/{frame}/dets.npy)")
    p.add_argument("--videos", nargs="*", default=None,
                   help="video ids (default: every subdirectory)")
    p.add_argument("--out", default="-", help="output JSONL path ('-' = stdout)")
    p.add_argument("--topk", type=int, default=100,
                   help="triplets kept per video (nogc ranking)")
    p.add_argument("--dsg_detr", action="store_true",
                   help="serve a DSG-DETR checkpoint instead of STTran")
    p.add_argument("--batch", type=int, default=16,
                   help="videos per device call (per shape bucket); the "
                        "model is batch-bound, not latency-bound, on TPU")
    p.add_argument("--workers", type=int, default=0,
                   help="grounding worker threads (0 = cfg.num_workers)")
    args = p.parse_args()

    import dataclasses
    cfg = dataclasses.replace(load_config(args.cfg_file), mode="sgdet",
                              frame_features_path=args.features_dir)
    logger = setup_logger()
    tax = schema.load_taxonomy()
    ds = UnlabeledVideos(args.features_dir, args.videos)
    for vid in ds.skipped:
        logger.warning(f"{vid}: no frame directories (skipped)")
    logger.info(f"videos to export: {len(ds)}")

    if args.dsg_detr:
        from train_DSG_DETR import build_model as build_dsg
        model = build_dsg(cfg, tax)
    else:
        model = build_model(cfg, tax)
    union_provider = make_union_provider(cfg, logger)

    def get_entry(i):
        """Serving is per-video fault-isolated: a corrupt feature directory
        skips that video with a warning instead of aborting the batch job
        (the training loop keeps its fail-loud prefetcher semantics)."""
        try:
            return ground_video(ds, i, cfg, False, cfg.buckets,
                                union_provider=union_provider)
        except Exception as e:
            logger.warning(f"{ds.video_ids[i]}: grounding failed ({e!r}) — skipped")
            return None

    # cache the init-sample grounding: grounding (and the union-feature C4
    # precompute) is the expensive per-video step, don't pay it twice for
    # the leading videos
    entry_cache: dict[int, object] = {}
    sample = None
    for i in range(len(ds)):
        entry_cache[i] = sample = get_entry(i)
        if sample is not None:
            break
    if sample is None:
        raise SystemExit("no video produced any relations")
    state, _ = create_train_state(model, sample, jax.random.key(cfg.seed),
                                  tx=make_optimizer(cfg.lr))
    state = restore_checkpoint(args.model_path, state)
    eval_step = jax.jit(make_eval_step(model))

    # throughput shape: grounding on worker threads overlaps device compute,
    # videos batch per shape bucket (shared bucket_events stream, same as
    # the streaming epoch eval) — bounded host memory
    from nl_vsgg_tpu.data.pipeline import GroundingPrefetcher, bucket_events

    sink = sys.stdout if args.out == "-" else open(args.out, "w")
    n_exported = 0

    NEEDED = ("attention_distribution", "spatial_distribution",
              "contacting_distribution")

    # transfer-aware batching (train.place_entries): host-stacked leaves
    # upload once each, the all-zero union_feat (95% of Entry bytes when no
    # union provider is configured) is created on device, and bf16 compute
    # uploads the large float arrays at half width
    no_union = union_provider is None
    cast16 = cfg.dtype == "bfloat16"

    def dispatch(items):
        entries = [e for _, e in items]
        # pad leftover batches to the compiled batch size by repeating the
        # first entry (rows discarded below): a fresh eval_step executable
        # per (bucket, leftover-size) would dominate a small export job
        entries += [entries[0]] * (args.batch - len(entries))
        batch = place_entries(entries, zero_union=no_union, cast_bf16=cast16)
        pred = eval_step(state, batch)
        # keep only the heads the JSON needs: global_output alone is ~12 MB
        # per 16-video batch, ~97% of the download on a tunneled chip
        return items, {k: pred[k] for k in NEEDED}

    def drain(items, handles):
        nonlocal n_exported
        pred = jax.device_get(handles)
        for bi, (i, e) in enumerate(items):
            sg = scene_graph_json(ds.video_ids[i], e,
                                  {k: v[bi] for k, v in pred.items()},
                                  tax, args.topk)
            sink.write(json.dumps(sg) + "\n")
            n_exported += 1

    def entry_for(i):
        return entry_cache.pop(i) if i in entry_cache else get_entry(i)

    prefetcher = GroundingPrefetcher(entry_for, list(range(len(ds))),
                                     num_workers=args.workers or cfg.num_workers)
    try:
        # double-buffered: dispatch batch i (async), then fetch + serialize
        # batch i-1 while the device computes i
        from nl_vsgg_tpu.data.pipeline import DoubleBuffer
        buf = DoubleBuffer()
        for kind, payload in bucket_events(iter(prefetcher), args.batch):
            if kind == "skip":
                logger.warning(f"{ds.video_ids[payload]}: no relations (skipped)")
            else:
                prev = buf.push(dispatch(payload))
                if prev is not None:
                    drain(*prev)
        prev = buf.flush()
        if prev is not None:
            drain(*prev)
    finally:
        if sink is not sys.stdout:
            sink.close()
    logger.info(f"exported {n_exported}/{len(ds)} scene graphs")


if __name__ == "__main__":
    main()

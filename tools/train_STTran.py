"""Train STTran on Action Genome with weak supervision (TPU-native).

Same CLI as the reference tools/train_STTran.py (argparse --cfg/--bce_loss,
:10-21) and the same training recipe (AdamW lr 1e-5, grad-clip 5.0, per-epoch
R@K eval driving ReduceLROnPlateau on mean R@20, NaN-skip), redesigned around:

  * padded Entry buckets -> one jit-compiled train step per bucket,
  * a data-parallel video batch (cfg.batch_videos) over the device mesh
    (the reference steps one video at a time),
  * host-side grounding (data/grounding.py) overlapped with device compute
    via a simple prefetch queue,
  * live VinVL union features when union_box_feature is on (the shipped
    recipe, ref lib/assign_pseudo_label.py:1320-1342) served from a per-video
    cached-C4 extractor instead of a full backbone rerun per step,
  * Orbax checkpoints with full train-state resume (the reference's
    torch.save is commented out).

The loop itself lives in run_training(cfg, args, build_model) so
tools/train_DSG_DETR.py shares it with its own model builder.
"""

from __future__ import annotations

import argparse
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from nl_vsgg_tpu.data import schema
from nl_vsgg_tpu.data.action_genome import AGTest, AGTrain
from nl_vsgg_tpu.data.entry import pick_bucket
from nl_vsgg_tpu.data.grounding import (entry_to_eval_pred,
                                        load_frame_features, wk_forward)
from nl_vsgg_tpu.data.pipeline import (GroundingPrefetcher, TruncationCounter,
                                       bucket_batches)
from nl_vsgg_tpu.eval import SceneGraphEvaluator
from nl_vsgg_tpu.models.sttran import STTran
from nl_vsgg_tpu.train import (PlateauScheduler, create_train_state,
                               make_eval_step, make_optimizer, make_train_step,
                               place_entries, stack_entries)
from nl_vsgg_tpu.train.state import set_learning_rate
from nl_vsgg_tpu.utils.checkpoint import save_checkpoint
from nl_vsgg_tpu.utils.config import load_config
from nl_vsgg_tpu.utils.glove import obj_edge_vectors
from nl_vsgg_tpu.utils.logging import MetricWriter, setup_logger


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="weak-supervision training")
    p.add_argument("--cfg", dest="cfg_file", default=None, help="config yaml")
    p.add_argument("--bce_loss", action="store_true", default=None)
    p.add_argument("--nepoch", type=int, default=None)
    p.add_argument("--max_videos", type=int, default=0,
                   help="debug: cap videos per epoch (0 = all)")
    return p.parse_args(argv)


def compute_dtype(cfg):
    """cfg.dtype -> model compute dtype (params stay fp32; heads cast back)."""
    return jnp.bfloat16 if cfg.dtype == "bfloat16" else None


def build_model(cfg, tax):
    # the masked STTranTransformer implements the shipped 'wk' variant
    # (lib/transformer_wk.py, selected at lib/sttran.py:358) exactly — golden
    # incl. empty-frame dropping. 'org' (lib/transformer.py::transformer) is
    # wk MINUS the empty-frame row removal: on every input the org class can
    # process (each frame 0..b-1 has >=1 relation — empty frames make its
    # fully-masked attention rows NaN), the two are the SAME function
    # (tests/test_sttran_transformer_parity.py::test_org_transformer_parity),
    # so 'org' maps to the same module. 'new'/'seq2seq' name classes that do
    # not exist in the reference tree (commented out at lib/sttran.py:362-368)
    # — refuse rather than silently ignore the key.
    if cfg.transformer_mode not in ("wk", "org"):
        raise ValueError(
            f"transformer_mode={cfg.transformer_mode!r} is not supported: "
            "'wk' and 'org' share one implementation (org == wk on every "
            "input org can process; see PARITY.md §2.6), and the reference's "
            "'new'/'seq2seq' classes do not exist in its tree")
    g36 = obj_edge_vectors(list(tax.object_classes[1:]), 200, cfg.glove_path)
    g37 = obj_edge_vectors(list(tax.object_classes), 200, cfg.glove_path)
    return STTran(mode=cfg.mode, obj_classes=tuple(tax.object_classes),
                  enc_layer_num=cfg.enc_layer, dec_layer_num=cfg.dec_layer,
                  feat_dim=cfg.feat_dim, glove_obj36=g36, glove_obj37=g37,
                  transformer_variant=cfg.transformer_mode,
                  dtype=compute_dtype(cfg), remat=cfg.remat,
                  fused=cfg.fused_attention)


def make_union_provider(cfg, logger):
    """Live union-feature extraction, honoring cfg.union_box_feature.

    The reference's shipped config runs with union_box_feature=true and
    extracts 2048x7x7 VinVL features at every person-object union box, every
    step (lib/assign_pseudo_label.py:1320-1342, rerunning the full backbone
    per frame). Here the detector computes each video's C4 maps once
    (detector/attr_rcnn.py::make_union_feature_fn) and serves union crops
    through the matmul RoIAlign + C5 head.

    Returns provider(ds, idx) -> UnionFeatFn | None, or None when the flag is
    off or prerequisites are missing (with a loud warning — round 1 zeroed
    the features silently, halving the relation models' vr-branch input).
    """
    if not cfg.union_box_feature:
        return None
    if not cfg.vinvl_ckpt or not os.path.isfile(str(cfg.vinvl_ckpt)):
        logger.warning(
            "union_box_feature=true but cfg.vinvl_ckpt is unset or missing "
            f"({cfg.vinvl_ckpt!r}): Entry.union_feat will be ZEROS, which "
            "diverges from the shipped reference recipe (convert a checkpoint "
            "with tools/convert_vinvl.py and set vinvl_ckpt)")
        return None
    from nl_vsgg_tpu.detector.attr_rcnn import AttrRCNNJax
    from nl_vsgg_tpu.detector.convert import load_checkpoint

    frames_root = cfg.frames_path or os.path.join(cfg.data_path, "frames")
    det_lock = threading.Lock()
    det_box: list = []
    warned: set = set()

    def provider(ds, idx):
        import cv2
        with det_lock:
            if not det_box:
                dt = None if cfg.vinvl_dtype == "float32" else cfg.vinvl_dtype
                det_box.append(AttrRCNNJax(load_checkpoint(str(cfg.vinvl_ckpt)),
                                           compute_dtype=dt))
            det = det_box[0]
        imgs = []
        for f in ds.video_list[idx]:
            img = cv2.imread(os.path.join(frames_root, f))
            if img is None:
                if "frames" not in warned:
                    warned.add("frames")
                    logger.warning(
                        f"union_box_feature=true but frame images are missing "
                        f"under {frames_root!r} (e.g. {f!r}): union features "
                        f"fall back to ZEROS for affected videos")
                return None
            imgs.append(img)
        return det.make_union_feature_fn(imgs)

    return provider


def _make_union_feat_fn(ds, idx, cfg, is_train, union_provider):
    """(union_feat_fn | None, cache_path | None, cache_key) for one video."""
    union_feat_fn, cache_path, cache_key = None, None, ""
    if union_provider is None:
        return union_feat_fn, cache_path, cache_key
    if cfg.union_feat_cache:
        # grounding is deterministic per video -> the extraction result
        # is reusable across epochs/eval re-runs (the reference reruns
        # the full backbone per step, lib/assign_pseudo_label.py:1336)
        vid = str(ds.video_ids[idx]).replace("/", "_")
        cache_path = os.path.join(cfg.union_feat_cache,
                                  "train" if is_train else "test",
                                  vid + ".npz")
        # provider identity: a re-converted/re-pointed checkpoint or a
        # dtype change invalidates the cache (build_entry also hashes
        # the union boxes, catching pseudo-label/detection changes)
        try:
            mtime = int(os.path.getmtime(str(cfg.vinvl_ckpt)))
        except OSError:
            mtime = 0
        cache_key = f"{cfg.vinvl_ckpt}:{mtime}:{cfg.vinvl_dtype}"
    lazy: list = []

    def union_feat_fn(f, boxes):
        # provider invoked only on an actual extraction (a cache hit
        # never reads frames or touches the detector). A failed provider
        # (frames missing) returns None: build_entry falls back to zeros
        # for the video WITHOUT caching them — the fallback must never
        # poison the persistent cache
        if not lazy:
            lazy.append(union_provider(ds, idx))
        if lazy[0] is None:
            return None
        return lazy[0](f, boxes)

    return union_feat_fn, cache_path, cache_key


def _union_provider_key(cfg, union_provider) -> str:
    """Union-feature provider identity for cache keys ('' = zeros/width-0)."""
    if union_provider is None:
        return ""
    try:
        mtime = int(os.path.getmtime(str(cfg.vinvl_ckpt)))
    except OSError:
        mtime = 0
    return f"{cfg.vinvl_ckpt}:{mtime}:{cfg.vinvl_dtype}"


def _entry_cache_for(ds, cfg, is_train, union_provider):
    """Per-dataset EntryCache (data/entry_cache.py), built once and stashed
    on the dataset object like _gt_packs; None when cfg.entry_cache is off."""
    if not cfg.entry_cache:
        return None
    split = "train" if is_train else "test"
    attr = f"_entry_cache_{split}"
    cache = getattr(ds, attr, None)
    if cache is None:
        from nl_vsgg_tpu.data.entry_cache import EntryCache, entry_cache_key
        cache = EntryCache(
            cfg.entry_cache, split,
            entry_cache_key(cfg, is_train,
                            _union_provider_key(cfg, union_provider)),
            union_dtype=cfg.union_feat_cache_dtype)
        setattr(ds, attr, cache)
    return cache


def ground_video(ds, idx, cfg, is_train, buckets, union_provider=None,
                 on_truncate=None):
    cache = _entry_cache_for(ds, cfg, is_train, union_provider)
    if cache is not None:
        from nl_vsgg_tpu.data.entry_cache import MISS
        hit = cache.load(ds.video_ids[idx])
        if hit is not MISS:
            e, tr = hit
            if on_truncate is not None and any(tr):
                on_truncate(*tr)  # keep the epoch truncation tally accurate
            return e
        captured = []
        user_cb = on_truncate

        def on_truncate(nb, nr):  # capture counts for the cache record
            captured.append((nb, nr))
            if user_cb is not None:
                user_cb(nb, nr)

    e = _ground_video_uncached(ds, idx, cfg, is_train, buckets,
                               union_provider, on_truncate)
    if cache is not None:
        uf = None if e is None else np.asarray(e.union_feat)
        if union_provider is not None and e is not None \
                and uf.shape[-1] and not uf.any():
            # the union extractor fell back to zeros (frames missing): do
            # not let the fallback poison the persistent cache — same rule
            # as the union-feature cache (grounding.py:301)
            return e
        cache.store(ds.video_ids[idx], e,
                    captured[0] if captured else (0, 0))
    return e


def _ground_video_uncached(ds, idx, cfg, is_train, buckets,
                           union_provider=None, on_truncate=None):
    paths = [os.path.join(cfg.frame_features_path, f)
             for f in ds.video_list[idx]]
    union_feat_fn, cache_path, cache_key = _make_union_feat_fn(
        ds, idx, cfg, is_train, union_provider)
    if cfg.use_native_grounding and cfg.use_native_io:
        from nl_vsgg_tpu.data.grounding import (_NATIVE_UNAVAILABLE,
                                                pack_gt_annotation,
                                                wk_forward_native)
        gt_pack = None
        if is_train:
            # GT packs are static per video — build once, reuse every epoch
            packs = getattr(ds, "_gt_packs", None)
            if packs is None:
                packs = {}
                ds._gt_packs = packs
            gt_pack = packs.get(idx)
            if gt_pack is None:
                gt_pack = pack_gt_annotation(ds.gt_annotations[idx])
                packs[idx] = gt_pack
        e = wk_forward_native(
            paths, ds.gt_annotations[idx], is_train,
            buckets.max_boxes, buckets.max_rels,
            union_feat_fn=union_feat_fn,
            feat_dim=cfg.feat_dim, pseudo_way=cfg.pseudo_way,
            compute_spatial_masks=not cfg.device_spatial_masks,
            on_truncate=on_truncate, union_cache_path=cache_path,
            union_cache_dtype=cfg.union_feat_cache_dtype,
            union_cache_key=cache_key, gt_pack=gt_pack)
        if e is not _NATIVE_UNAVAILABLE:
            return e
        # library or dets_f32 sidecars unavailable: python path below
    frames = load_frame_features(paths,
        use_native=cfg.use_native_io, feat_dim=cfg.feat_dim)
    # ladders pass through: build_entry picks the rung from the EXACT
    # post-grounding counts (pick_joint_bucket)
    return wk_forward(frames, ds.gt_annotations[idx], is_train,
                      buckets.max_boxes, buckets.max_rels,
                      union_feat_fn=union_feat_fn,
                      feat_dim=cfg.feat_dim, pseudo_way=cfg.pseudo_way,
                      compute_spatial_masks=not cfg.device_spatial_masks,
                      on_truncate=on_truncate,
                      union_cache_path=cache_path,
                      union_cache_dtype=cfg.union_feat_cache_dtype,
                      union_cache_key=cache_key)


class DeviceEvalPromotion:
    """Burn-in equivalence check that promotes the on-device R@K scorer.

    For the first `burnin` comparable videos of an epoch eval both
    evaluators run and their with/no-constraint/semi R@K rows are compared
    exactly (atol 1e-6 covers fp32-vs-float64 division only; hit counts
    must agree). On full agreement the host evaluator is skipped for the
    remaining videos and `score(20)` — the plateau metric — comes from the
    device rows. After promotion every `recheck_every`-th device-scored
    video is STILL host-compared (r3 advisor: a divergence that only
    manifests on later videos — e.g. a GT-frame-selection difference the
    burn-in sample never exercises — must not silently bias the plateau
    metric for the whole epoch). ANY value mismatch demotes: the eval loop
    reverts to host scoring for the rest of the epoch, a burn-in demotion
    costing no more than device_eval_promote=false, while a post-promotion
    (late) demotion keeps recording host rows into `rows` so `score()`
    still covers the full split — with at most `recheck_every - 1`
    unverified device rows before the mismatch (the caller logs that
    caveat). Videos whose GT exceeds the device frame bucket
    (gt_dropped > 0) are never compared NOR device-scored into the
    metric — the loop host-scores them and records the host rows — so
    bucket truncation can neither demote the epoch nor bias the promoted
    mean. Final reported numbers should always come from the host
    evaluator (tools/test_*); this only accelerates the per-epoch metric.
    """

    def __init__(self, burnin: int = 16, recheck_every: int = 64):
        self.burnin = burnin
        self.recheck_every = recheck_every
        self.checked = 0
        self.ok = True
        self.late_demoted = False
        self._since_check = 0  # device-only videos since the last host compare
        self.rows: list[dict] = []

    @property
    def promoted(self) -> bool:
        return self.ok and self.checked >= self.burnin

    def host_needed(self) -> bool:
        """True during burn-in AND on periodic post-promotion recheck ticks."""
        if not self.promoted:
            return True
        return (self.recheck_every > 0
                and self._since_check + 1 >= self.recheck_every)

    def add_skip(self, gt_annotation) -> None:
        # grounding produced nothing: the host evaluator appends one 0.0 row
        # per frame (eval/recall.py:230-238); mirror that frame count
        z = np.zeros((len(gt_annotation), 3), np.float32)
        self.rows.append({"recall": z, "recall_nogc": z, "semi": z,
                          "gt_dropped": 0})

    @staticmethod
    def _host_rows(evaluator, host_marks) -> dict:
        row = {"gt_dropped": 0}
        for name, sink in (("recall", evaluator.recall),
                           ("recall_nogc", evaluator.recall_nogc),
                           ("semi", evaluator.semi_recall)):
            row[name] = np.stack(
                [np.asarray(sink[k][host_marks[name]:], np.float64)
                 for k in (10, 20, 50)], axis=-1)
        return row

    def add_host_rows(self, evaluator, host_marks) -> None:
        """Record a host-scored video (bucket-truncation fallback)."""
        self.rows.append(self._host_rows(evaluator, host_marks))

    def add(self, dev_row: dict, evaluator, host_marks=None) -> None:
        """dev_row: device_eval_video output. host_marks: per-sink list
        lengths captured BEFORE the host scored this video (burn-in and
        periodic recheck videos)."""
        self.rows.append(dev_row)
        if host_marks is None:
            self._since_check += 1
            return
        was_promoted = self.promoted
        self._since_check = 0
        self.checked += 1
        ok = dev_row.get("gt_dropped", 0) == 0  # safety; loop diverts these
        host = self._host_rows(evaluator, host_marks)
        for name in ("recall", "recall_nogc", "semi"):
            dev = np.asarray(dev_row[name], np.float64)
            ok &= host[name].shape == dev.shape and \
                np.allclose(host[name], dev, atol=1e-6)
        self.ok &= ok
        if not ok and was_promoted:
            self.late_demoted = True

    def score(self, k: int = 20) -> float:
        col = {10: 0, 20: 1, 50: 2}[k]
        r = np.concatenate([d["recall"] for d in self.rows]) if self.rows \
            else np.zeros((0, 3))
        return float(r[:, col].mean()) if len(r) else 0.0


def evaluate_epoch(cfg, tax, ds_test, n_test, get_entry, eval_step, state,
                   evaluator=None, device_recalls=None, zero_union=False,
                   indices=None, place_fn=None, promotion=None):
    """Streaming evaluation over the test split (train_STTran.py:210-232).

    Entries are grounded by the prefetcher, grouped into at most ONE pending
    batch per bucket, scored and immediately dropped — peak host memory is
    independent of the split size (round 1 held every padded Entry, ~90 GB at
    real AG scale). Pass a list as `device_recalls` (or set cfg.device_eval)
    to also score R@K with the on-device scorers (eval/recall_jax.py); the
    host evaluator remains the reported source of truth. `indices` restricts
    the videos scored (multi-host: each process scores its shard, then
    parallel.distributed.merge_evaluators combines them). `place_fn`
    (single-controller multi-device: run_training's place_batch) pads the
    video axis to the mesh's data axis and shards the batch, so eval uses
    the same data parallelism as training; padded rows are never read.
    """
    if evaluator is None:
        evaluator = SceneGraphEvaluator(mode=cfg.mode, taxonomy=tax)
    prefetcher = GroundingPrefetcher(
        get_entry, list(range(n_test)) if indices is None else list(indices),
        num_workers=cfg.num_workers)
    from nl_vsgg_tpu.data import bucket_events

    def _marks():
        return {"recall": len(evaluator.recall[10]),
                "recall_nogc": len(evaluator.recall_nogc[10]),
                "semi": len(evaluator.semi_recall[10])}

    def score(items, handles):
        pred = jax.device_get(handles)
        ps = [entry_to_eval_pred(e, {k: v[bi] for k, v in pred.items()})
              for bi, (i, e) in enumerate(items)]
        # batched device scoring: ONE device call + ONE packed fetch for the
        # whole batch — the per-video path pays the fixed ~30 ms tunnel
        # round-trip 3+ times per video (VERDICT r3 #3). Computed up front
        # when any video will need a device row this batch.
        dev_rows = [None] * len(items)
        if device_recalls is not None or (promotion is not None
                                          and promotion.ok):
            from nl_vsgg_tpu.eval.recall_jax import device_eval_batch
            dev_rows = device_eval_batch(
                [e for _, e in items], ps,
                [ds_test.gt_annotations[i] for i, _ in items],
                evaluator, f_bucket=32)
        for bi, (i, e) in enumerate(items):
            p = ps[bi]
            # a demoted promotion reverts to plain host scoring: no further
            # device comparisons for the rest of the epoch
            active = promotion is not None and promotion.ok
            dev_row = dev_rows[bi]
            if device_recalls is not None:
                device_recalls.append(dev_row)
            if not active:
                marks = _marks()
                evaluator.evaluate_scene_graph(ds_test.gt_annotations[i], p)
                if promotion is not None and promotion.late_demoted:
                    # post-promotion demotion: keep recording host rows so
                    # promotion.score() still covers the full split
                    promotion.add_host_rows(evaluator, marks)
                continue
            if dev_row.get("gt_dropped", 0):
                # GT past the device frame bucket: device scores would drop
                # it — host-score this video and record the host rows (does
                # not count toward burn-in, cannot demote)
                marks = _marks()
                evaluator.evaluate_scene_graph(ds_test.gt_annotations[i], p)
                promotion.add_host_rows(evaluator, marks)
            elif promotion.host_needed():  # burn-in or periodic recheck
                marks = _marks()
                evaluator.evaluate_scene_graph(ds_test.gt_annotations[i], p)
                promotion.add(dev_row, evaluator, host_marks=marks)
            else:  # promoted: device rows only, host evaluator skipped
                promotion.add(dev_row, evaluator)

    # double-buffered: dispatch batch i (async), THEN fetch + host-score
    # batch i-1 — the device computes while the host evaluator runs
    from nl_vsgg_tpu.data.pipeline import DoubleBuffer
    buf = DoubleBuffer()
    for kind, payload in bucket_events(iter(prefetcher), cfg.batch_videos):
        if kind == "skip":
            # empty-pred host scoring is one zeros-append per frame — run it
            # even under promotion (its rows are simply unused when promoted)
            evaluator.evaluate_scene_graph(ds_test.gt_annotations[payload], {})
            if promotion is not None and (promotion.ok or promotion.late_demoted):
                promotion.add_skip(ds_test.gt_annotations[payload])
            continue
        items = payload
        batch = place_entries([e for _, e in items], zero_union=zero_union,
                              rel_bf16=cfg.dtype == "bfloat16")
        if place_fn is not None:
            batch = place_fn(batch)
        prev = buf.push((items, eval_step(state, batch)))
        if prev is not None:
            score(*prev)
    prev = buf.flush()
    if prev is not None:
        score(*prev)
    return evaluator


class _NullMetrics:
    """Metric sink for non-primary processes (one metrics.jsonl per run)."""

    def write(self, step, **scalars):
        pass

    def close(self):
        pass


def run_training(cfg, args, build_model_fn):
    """The shared training loop (STTran and DSG-DETR differ only in the model
    builder — the reference duplicates the whole file, tools/train_DSG_DETR.py)."""
    if cfg.mode == "sgdet" and not cfg.is_wks:
        # the reference's non-wks sgdet needs an AG-trained detector
        # (lib/sttran.py:185-283); the library path exists (models/
        # sgdet_infer + data/infer_entry, oracle-tested) but the shipped
        # NL-VSGG training recipe is weak-supervision-only — refuse rather
        # than silently train the wrong branch
        raise ValueError("is_wks=false sgdet training is not a shipped "
                         "NL-VSGG recipe; see models/sgdet_infer for the "
                         "non-wks inference path")
    if cfg.mode != "sgdet":
        # The reference routes sgcls/predcls training through the GT-box
        # detector path after printing "error! we do not train predcls and
        # sgcls task!" (lib/object_detector.py:47-55) — and then crashes:
        # sgcls entries carry no union_feat for the relation head
        # (lib/object_detector.py:144-171 vs lib/sttran.py:380), and predcls
        # feeds the 36-wide one-hot passthrough distribution into a 37-label
        # CrossEntropy (tools/train_STTran.py:172). Training those modes is
        # not a recipe anywhere; refuse loudly instead of reaching the wrong
        # data path. sgcls/predcls EVALUATION is fully supported
        # (tools/test_STTran.py, incl. the sgcls reassignment flow).
        raise ValueError(
            f"mode={cfg.mode!r} training is not a shipped NL-VSGG recipe "
            "(the reference prints 'error! we do not train predcls and "
            "sgcls task!' and its GT-box train path cannot run); use "
            "tools/test_STTran.py for sgcls/predcls evaluation")
    # multi-host: must run before the first device use (parallel/distributed)
    from nl_vsgg_tpu.parallel.distributed import (DistributedBatcher,
                                                  allgather_obj,
                                                  init_distributed, is_primary,
                                                  merge_evaluators)
    multiproc = init_distributed(cfg)
    primary = is_primary()
    logger = setup_logger(save_dir=cfg.save_path if primary else None)
    if multiproc:
        logger.info(f"distributed: process {jax.process_index()}/"
                    f"{jax.process_count()}, {jax.local_device_count()} local "
                    f"/ {jax.device_count()} global devices")
        if not primary:
            import logging as _logging  # one console log stream, not N
            logger.setLevel(_logging.WARNING)
    os.makedirs(cfg.save_path, exist_ok=True)
    if primary:
        with open(os.path.join(cfg.save_path, "configs.json"), "w") as f:
            f.write(cfg.to_json())
    metrics = MetricWriter(cfg.save_path) if primary else _NullMetrics()
    tax = schema.load_taxonomy()

    logger.info("loading datasets")
    ds_train = AGTrain(cfg.data_path, pseudo_label_path=cfg.pseudo_localized_SG_path,
                       remove_one_frame_video=cfg.remove_one_frame_video,
                       auto_download=cfg.auto_download, logger=logger,
                       save_path=cfg.save_path if primary else None)
    ds_test = AGTest(cfg.data_path if cfg.data_path.endswith("annotations")
                     else os.path.join(cfg.data_path, "annotations"))
    logger.info(f"train videos: {len(ds_train)}, test videos: {len(ds_test)}")

    model = build_model_fn(cfg, tax)
    # rbg PRNG: the per-step dropout/label-sampling bits are ~16% of the
    # train step under the default threefry (see cfg.prng_impl)
    rng = jax.random.key(cfg.seed, impl=cfg.prng_impl)
    union_provider = make_union_provider(cfg, logger)
    # separate counters: eval-split truncations must not masquerade as
    # train-label loss in the next epoch's warning
    trunc = TruncationCounter()
    trunc_eval = TruncationCounter()

    from nl_vsgg_tpu.utils.profiling import PhaseTimer
    timer = PhaseTimer()

    def ground(ds, idx, is_train):
        with timer("grounding(host)"):
            return ground_video(ds, int(idx), cfg, is_train, cfg.buckets,
                                union_provider=union_provider,
                                on_truncate=trunc.add if is_train else trunc_eval.add)

    # init from the first groundable video's bucket
    sample = None
    for i in range(len(ds_train)):
        sample = ground(ds_train, i, True)
        if sample is not None:
            break
    assert sample is not None, "no groundable training video"
    tx = make_optimizer(cfg.lr, cfg.weight_decay, cfg.grad_clip_norm)
    state, tx = create_train_state(model, sample, rng, tx=tx)
    # auto-resume from the newest checkpoint (the reference cannot resume)
    from nl_vsgg_tpu.utils.checkpoint import (latest_step, load_meta,
                                              restore_checkpoint)
    ckpt_dir = os.path.join(cfg.save_path, "ckpt")
    start_epoch = 0
    resume_meta = None
    resumed = latest_step(ckpt_dir)
    if resumed is not None:
        state = restore_checkpoint(ckpt_dir, state)
        resume_meta = load_meta(ckpt_dir, resumed)
        start_epoch = resumed + 1
        logger.info(f"resumed from checkpoint epoch {resumed}")
    train_step = jax.jit(make_train_step(model, tx, bce=cfg.bce_loss),
                         donate_argnums=(0,))  # reuse state buffers in-place
    eval_step = jax.jit(make_eval_step(model))
    if multiproc:
        # per-process local eval over replicated host weights (jitted ONCE;
        # the weights are re-gathered and device_put per epoch)
        local_eval = jax.jit(lambda v, b: jax.vmap(
            lambda e: model.apply(v, e, train=False))(b))
    scheduler = PlateauScheduler(cfg.lr)
    if resume_meta and "scheduler" in resume_meta:
        # restore the decayed lr + plateau history: without this the first
        # post-resume epoch's scheduler.step() would write cfg.lr back into
        # the (correctly restored) opt_state
        scheduler.load_state_dict(resume_meta["scheduler"])
        state = set_learning_rate(state, scheduler.lr)

    # multi-device: shard the video batch over the mesh 'data' axis, params
    # per the model-parallel rules; XLA inserts the gradient all-reduce
    mesh = None
    # mesh: {data: 1, model: 1} on a multi-device host means "use one
    # device" — the plain single-device path (and the device entry store)
    if len(jax.devices()) > 1 and (cfg.mesh.data, cfg.mesh.model) != (1, 1):
        from nl_vsgg_tpu.parallel import (batch_sharding, make_mesh,
                                          shard_state)
        model_par = cfg.mesh.model
        data_par = (len(jax.devices()) // model_par if cfg.mesh.data == -1
                    else cfg.mesh.data)
        mesh = make_mesh(data=data_par, model=model_par)
        state = shard_state(mesh, state)
        _bs = batch_sharding(mesh)
        logger.info(f"mesh: data={data_par} model={model_par}")
        if cfg.batch_videos % data_par:
            logger.info(
                f"batch_videos={cfg.batch_videos} not a multiple of the data "
                f"axis ({data_par}): short batches are zero-padded (excluded "
                f"from loss/stat means by the train step, so this only wastes "
                f"compute — prefer a multiple)")

    def place_batch(batch):
        if mesh is None:
            return batch
        # pad the video axis to a multiple of the data axis; the train step
        # weights loss/stat means by per-video validity so padding is inert
        b = batch.num_frames.shape[0]
        need = (-b) % data_par
        if need:
            batch = jax.tree.map(
                lambda x: jnp.concatenate(
                    [x, jnp.zeros((need,) + x.shape[1:], x.dtype)]), batch)
        return jax.tree.map(lambda x: jax.device_put(x, _bs), batch)

    n_train = len(ds_train) if not args.max_videos else min(args.max_videos, len(ds_train))
    n_test = len(ds_test) if not args.max_videos else min(args.max_videos, len(ds_test))

    # device-resident Entry store (data/device_store.py): epoch 0 fills it
    # while streaming; later epochs gather batches HBM-to-HBM from indices
    # alone. Entries are added in their UPLOAD form (width-0 union when no
    # provider, bf16 rel arrays) so gathered batches are bit-identical to
    # place_entries (tests/test_device_store.py).
    entry_store = None
    if cfg.device_entry_store_gb:
        if multiproc and mesh is None:
            logger.warning("device_entry_store_gb needs a mesh under "
                           "multi-process runs; ignoring")
        else:
            from nl_vsgg_tpu.data.device_store import DeviceEntryStore
            # under a mesh the store shards each bucket over 'data' and
            # gathered batches arrive pre-sharded P('data') — no place_batch.
            # Multi-controller: every process records identical bookkeeping
            # from the deterministic global batches (add_batch) and holds
            # only its own devices' shards; warm gathers are SPMD.
            entry_store = DeviceEntryStore(
                budget_bytes=int(cfg.device_entry_store_gb * 1e9),
                rel_bf16=cfg.dtype == "bfloat16", mesh=mesh)
            if mesh is not None:
                logger.info(f"device entry store sharded over data={data_par}"
                            f" (per-chip resident = bytes/{data_par})")

    # resume continues the step counter (metrics.jsonl keys stay unique and
    # the per-step dropout keys don't replay epoch 0's sequence)
    global_step = int(jax.device_get(state.step))
    for epoch in range(start_epoch, cfg.nepoch):
        t0 = time.time()
        order = np.random.default_rng(cfg.seed + epoch).permutation(n_train)
        n_seen = 0

        # grounding runs on worker threads, overlapping device compute
        if multiproc:
            # fixed-composition global batches: every process grounds its
            # contiguous block of each batch and contributes it as the
            # process-local shard of one global Entry (parallel/distributed).
            # With the device store, warm epochs gather stored batches SPMD
            # (identical plan on every process — the bookkeeping is built
            # from the same deterministic add_batch calls) and only misses
            # flow through the batcher; cold batches are adopted in place.
            # Adopted slots keep the batcher's semantics exactly, including
            # zero slots for failed groundings (inert under the
            # valid-weighted step, like every cold epoch).
            def batch_iter():
                stream_order = order.tolist()
                n_stored_batches = 0
                if entry_store is not None:
                    stored, stream_order = entry_store.plan_batches(
                        stream_order, cfg.batch_videos)
                    for idxs in stored:  # SPMD gather: indices only
                        with timer("store_gather"):
                            batch = entry_store.gather(idxs)
                        if batch is None:  # defensive: plan/store drift
                            stream_order.extend(idxs)
                            continue
                        n_stored_batches += 1
                        yield cfg.batch_videos, batch
                for chunk, b in DistributedBatcher(
                        lambda idx: ground(ds_train, int(idx), True),
                        stream_order, cfg.batch_videos, mesh,
                        feat_dim=cfg.feat_dim,
                        zero_union=union_provider is None,
                        rel_bf16=cfg.dtype == "bfloat16",
                        num_workers=cfg.num_workers,
                        device_masks=cfg.device_spatial_masks,
                        yield_indices=True):
                    if entry_store is not None and not entry_store.overflow:
                        with timer("store_build"):
                            entry_store.add_batch(chunk, b)
                    yield cfg.batch_videos, b
                if entry_store is not None and (n_stored_batches
                                                or entry_store.overflow):
                    logger.info(
                        f"device entry store: {n_stored_batches} gathered "
                        f"batches this epoch, {entry_store.bytes / 1e9:.2f} "
                        f"GB resident"
                        + (", over budget — remainder streams"
                           if entry_store.overflow else ""))
        else:
            def batch_iter():
                stream_order = order.tolist()
                n_stored_batches = 0
                if entry_store is not None:
                    stored, stream_order = entry_store.plan_batches(
                        stream_order, cfg.batch_videos)
                    for idxs in stored:  # HBM-to-HBM: indices only
                        with timer("store_gather"):
                            batch = entry_store.gather(idxs)
                        if batch is None:  # defensive: plan/store drift ->
                            stream_order.extend(idxs)  # stream, don't crash
                            continue
                        n_stored_batches += 1
                        yield len(idxs), batch
                from nl_vsgg_tpu.data import bucket_events
                prefetcher = GroundingPrefetcher(
                    lambda idx: ground(ds_train, idx, True),
                    stream_order, num_workers=cfg.num_workers)
                for kind, payload in bucket_events(iter(prefetcher),
                                                   cfg.batch_videos):
                    if kind == "skip":
                        continue
                    bucket_entries = [e for _, e in payload]
                    with timer("batch_build"):
                        # with no union provider, union_feat is all-zeros:
                        # build it on device instead of uploading ~38 MB/video
                        # of zeros; bf16 models take union_feat/spatial_masks
                        # pre-cast (the model's own cast, moved off the step's
                        # HBM hot path)
                        batch = place_entries(bucket_entries,
                                              zero_union=union_provider is None,
                                              rel_bf16=cfg.dtype == "bfloat16")
                        batch = place_batch(batch)
                    if entry_store is not None and not entry_store.overflow \
                            and len(bucket_entries) == int(
                                batch.num_frames.shape[0]):
                        # adopt the uploaded batch as store rows: device-side
                        # concat, no second upload (padded short batches are
                        # skipped — their fill rows must not become gatherable)
                        with timer("store_build"):
                            entry_store.add_batch(
                                [i for i, _ in payload], batch)
                    yield len(bucket_entries), batch
                if entry_store is not None and (n_stored_batches
                                                or entry_store.overflow):
                    logger.info(
                        f"device entry store: {n_stored_batches} gathered "
                        f"batches this epoch, {entry_store.bytes / 1e9:.2f} "
                        f"GB resident"
                        + (", over budget — remainder streams"
                           if entry_store.overflow else ""))
        profiling = False
        for n_batch, batch in batch_iter():
            n_seen += n_batch
            if cfg.profile_steps and primary and epoch == start_epoch \
                    and global_step == 2:
                try:  # on-demand XProf trace (SURVEY.md §5: reference has none)
                    jax.profiler.start_trace(os.path.join(cfg.save_path, "trace"))
                    profiling = True
                except Exception as e:  # platform may not support tracing
                    logger.warning(f"profiler trace unavailable: {e!r}")
            with timer("step_dispatch"):  # async dispatch; device time is not
                state, m = train_step(state, batch, jax.random.fold_in(rng, global_step))
            global_step += 1
            if profiling and global_step >= 2 + cfg.profile_steps:
                jax.block_until_ready(m["total"])
                jax.profiler.stop_trace()
                profiling = False
                logger.info(f"wrote {cfg.profile_steps}-step trace to "
                            f"{os.path.join(cfg.save_path, 'trace')}")
            if global_step % 100 == 0:
                metrics.write(global_step, **{k: float(v) for k, v in m.items()})
                logger.info(f"e{epoch} step {global_step} loss {float(m['total']):.4f}")
        if profiling:
            jax.profiler.stop_trace()

        tv, tb, tr = trunc.take()
        if tv:
            logger.warning(
                f"epoch {epoch}: bucket truncation dropped {tb} boxes / {tr} "
                f"relations across {tv} videos — enlarge cfg.buckets "
                f"(max_boxes/max_rels) to keep those labels")
            metrics.write(global_step, truncated_videos=tv,
                          truncated_boxes=tb, truncated_rels=tr)
        logger.info(f"epoch {epoch} done in {(time.time()-t0)/60:.1f} min "
                    f"({n_seen} videos, skipped {int(state.skipped)})")
        logger.info("host phases:\n" + timer.summary())

        # ---- per-epoch evaluation (train_STTran.py:210-232), streamed ----
        device_recalls = [] if cfg.device_eval else None
        promotion = None
        if cfg.device_eval_promote:
            if multiproc:
                logger.warning("device_eval_promote is single-process only "
                               "(burn-in spans one evaluator); ignoring")
            else:
                promotion = DeviceEvalPromotion(cfg.device_eval_burnin,
                                                cfg.device_eval_recheck)
        if multiproc:
            # each process scores its strided shard of the test split with a
            # LOCAL copy of the (replicated-to-host) weights, then the
            # per-video recall lists are all-gathered — identical means to a
            # single-process evaluation of the full split
            from jax.experimental import multihost_utils
            # tiled=True: for global (non-fully-addressable) arrays this
            # materializes the full value on every host, shape unchanged;
            # device_put ONCE so eval batches don't each re-upload the model
            host_vars = jax.device_put(multihost_utils.process_allgather(
                {"params": state.params, "batch_stats": state.batch_stats},
                tiled=True))
            ev_step = lambda _state, b: local_eval(host_vars, b)
            my_idx = list(range(jax.process_index(), n_test, jax.process_count()))
        else:
            ev_step, my_idx = eval_step, None
        evaluator = evaluate_epoch(cfg, tax, ds_test, n_test,
                                   lambda i: ground(ds_test, i, False),
                                   ev_step, state,
                                   device_recalls=device_recalls,
                                   zero_union=union_provider is None,
                                   indices=my_idx,
                                   place_fn=None if (multiproc or mesh is None)
                                   else place_batch,
                                   promotion=promotion)
        if multiproc:
            merge_evaluators(evaluator)
            if device_recalls is not None:
                # merge the auxiliary on-device R@K shards too, so the log
                # covers the full split like the host evaluator does
                device_recalls = [d for shard in allgather_obj(device_recalls)
                                  for d in shard]
        if device_recalls:
            for name in ("recall", "recall_nogc", "semi"):
                r = np.concatenate([d[name] for d in device_recalls])
                logger.info("device %s: R@10 %.4f R@20 %.4f R@50 %.4f"
                            % (name, *r.mean(0)))
            dropped = sum(d.get("gt_dropped", 0) for d in device_recalls)
            if dropped:
                logger.warning(
                    f"device R@K excluded {dropped} GT relations past the "
                    f"frame/relation buckets — the host numbers above are "
                    f"the source of truth (raise f_bucket/g_max to compare)")
        ev, eb, er = trunc_eval.take()
        if ev:
            logger.warning(
                f"epoch {epoch} eval: bucket truncation dropped {eb} boxes / "
                f"{er} relations across {ev} test videos — enlarge cfg.buckets")
        stats_note = ""
        if promotion is not None and promotion.promoted:
            score = promotion.score(20)
            stats_note = (f"burn-in+recheck subset only ({promotion.checked} "
                          f"host-scored videos) — promoted epoch")
            logger.info(
                f"device evaluator promoted after {promotion.checked} burn-in "
                f"videos of exact agreement: epoch metric (mean R@20 = "
                f"{score:.4f}) is device-scored; host stats below cover only "
                f"the burn-in — run tools/test_*.py for reported numbers")
        elif promotion is not None and promotion.late_demoted:
            # a post-promotion recheck mismatch: host rows resumed for the
            # rest of the split, so promotion.rows covers every video, but up
            # to recheck_every-1 device rows before the mismatch are
            # unverified — flag the epoch metric as suspect
            score = promotion.score(20)
            stats_note = "partial host coverage — demoted mid-epoch"
            logger.warning(
                f"device evaluator DEMOTED mid-epoch by a recheck mismatch "
                f"after promotion: epoch metric (mean R@20 = {score:.4f}) "
                f"mixes verified device rows and host rows, with up to "
                f"{promotion.recheck_every - 1} unverified device-scored "
                f"videos before the mismatch — treat this epoch's metric as "
                f"suspect and re-run tools/test_*.py")
        else:
            if promotion is not None:
                why = ("host/device mismatch during burn-in — demoted"
                       if not promotion.ok else
                       f"only {promotion.checked}/{promotion.burnin} "
                       f"comparable burn-in videos in the split")
                logger.warning(
                    f"device evaluator NOT promoted ({why}); host eval "
                    f"covered the full split as usual")
            score = evaluator.mean_score(20)
        evaluator.calculate_mean_recall()
        logger.info(f"------------Inference in Epoch ({epoch})------------")
        evaluator.print_stats(logger, note=stats_note)
        new_lr = scheduler.step(score)
        state = set_learning_rate(state, new_lr)
        metrics.write(global_step, epoch=epoch, mean_r20=score, lr=new_lr)
        # checkpoint AFTER the eval + plateau update so a resume continues
        # with the epoch's scheduler decision applied (the sidecar persists
        # the plateau history the TrainState pytree cannot hold)
        save_checkpoint(os.path.join(cfg.save_path, "ckpt"), epoch, state,
                        config_json=cfg.to_json() if primary else None,
                        extra={"scheduler": scheduler.state_dict()}
                        if primary else None)

    metrics.close()
    return state


def main():
    args = parse_args()
    overrides = {}
    if args.bce_loss:
        overrides["bce_loss"] = True
    if args.nepoch is not None:
        overrides["nepoch"] = args.nepoch
    cfg = load_config(args.cfg_file, overrides)
    run_training(cfg, args, build_model)


if __name__ == "__main__":
    main()

"""Typed configuration system.

Mirrors every flag of the reference's global easydict singleton
(/root/reference/lib/config.py:8-59 and configs/nl_vsgg_config.yml) but as an
immutable dataclass: configs are explicit values passed down the stack, never
import-time global state. YAML merging keeps the reference's type-coercion
behavior (lib/config.py:62-94) so the shipped config files remain drop-in.

TPU-specific additions live in their own namespace fields (mesh shape, dtype
policy, bucketing) so reference configs parse unchanged.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any

import yaml


@dataclass(frozen=True)
class BucketConfig:
    """Static-shape padding buckets for jit stability.

    Every video is padded to the smallest rung that fits its EXACT
    post-grounding counts (data/entry.py pick_joint_bucket — box and rel
    ladders are paired by rung index, one compile per rung). Defaults are
    the DP-tuned ladder from `tools/tune_buckets.py --synthetic 8000`
    (AG-shaped distribution, assumptions in synthetic_ag_counts): +40%
    padded-cost overhead / 0 truncated vs +57% / 64 truncated for the
    previous power-of-two ladder, per-rung occupancy 68-83% (BASELINE.md
    bucket-ladder evidence). Re-run the tuner against the real dataset
    (`--cfg`, scans feat.npy headers) when the artifacts exist.
    """

    max_frames: tuple[int, ...] = (8, 16, 32, 64, 128)
    max_boxes: tuple[int, ...] = (64, 96, 144, 224, 376)
    max_rels: tuple[int, ...] = (40, 64, 96, 152, 272)


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout. `data` shards videos; `model` shards wide layers."""

    data: int = -1  # -1 = all devices
    model: int = 1


@dataclass(frozen=True)
class Config:
    # --- reference flags (lib/config.py:10-59) ---
    # Every reference key is accepted so its YAML configs stay drop-in. Keys
    # that are dead in the reference itself (gpu_id, multi_gpus, schedule,
    # optimizer, teacher_model_path, exp_name, datasize, lr_drop,
    # fraction_warmup_steps, text_encoder_lr, lr_backbone, loss,
    # ws_object_bbox_path — none are read by its live train/test paths) are
    # parsed-but-inert here too; tensorboard_name is subsumed by the JSONL
    # MetricWriter, model_path by the --model_path CLI arg. Keys with live
    # semantics (is_wks, transformer_mode, bce_loss, ...) are validated at
    # tool startup rather than silently ignored.
    gpu_id: int = 0
    multi_gpus: bool = False
    num_workers: int = 4
    mode: str = "sgdet"  # sgdet | sgcls | predcls
    transformer_mode: str = "wk"
    model_path: str = ""
    optimizer: str = "adamw"
    lr: float = 1e-5
    text_encoder_lr: float = 1e-5
    lr_backbone: float = 1e-5
    schedule: str = "step"
    nepoch: int = 10
    enc_layer: int = 1
    dec_layer: int = 3
    is_wks: bool = True
    bce_loss: bool = True
    feat_dim: int = 2048
    pseudo_way: int = 0
    remove_one_frame_video: bool = True
    union_box_feature: bool = True
    loss: str = "BCE"
    teacher_model_path: str = ""
    save_path: str = ""
    data_path: str = ""
    datasize: str = "large"
    ckpt: str | None = None
    ws_object_bbox_path: str | None = None
    pseudo_localized_SG_path: str = "datasets/AG/final_ag_data_w_neg.pkl"
    exp_name: str = "defaultExp"
    tensorboard_name: str = "runs/scalar_example"
    lr_drop: int = 60
    fraction_warmup_steps: float = 0.01

    # --- TPU-native additions ---
    seed: int = 1000
    dtype: str = "float32"  # compute dtype: float32 | bfloat16 (params stay fp32)
    grad_clip_norm: float = 5.0  # tools/train_STTran.py:193
    weight_decay: float = 1e-2  # lib/AdamW.py default
    batch_videos: int = 1  # videos per step per device (reference: 1 total).
    # Production value: 64 (configs/nl_vsgg_config.yml) — the measured
    # single-chip optimum of the MFU-vs-batch curve (BASELINE.md r5:
    # b64 > b128 by ~2 MFU pts for both families; b256 infeasible).
    frame_features_path: str = "datasets/AG/frame_features"
    frames_path: str = ""  # raw frame images root ("" -> <data_path>/frames);
    # needed when union_box_feature is true (ref assign_pseudo_label.py:1323)
    vinvl_ckpt: str = ""  # converted VinVL npz (tools/convert_vinvl.py) for
    # live union-feature extraction; "" + union_box_feature -> loud warning
    vinvl_dtype: str = "float32"  # detector compute dtype for the live
    # union-feature extractor: bfloat16 is ~1.3x faster (grouped convs are
    # memory-bound) at ~1e-2 relative feature shift; fp32 = exact parity
    auto_download: bool = False  # fetch AG training pickles from HF like the
    # reference (dataloader/wk_action_genome.py:13-15) — opt-in, offline-safe
    glove_path: str = ""  # optional glove.6B.200d.txt; deterministic fallback
    buckets: BucketConfig = field(default_factory=BucketConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    use_native_io: bool = True  # C++ fast path for host data packing
    use_native_grounding: bool = True  # C++ assign+pack grounding engine
    # (native/grounding.cpp, byte-identical to the python path by fuzz test);
    # auto-falls back to python when the library or sidecars are missing
    device_spatial_masks: bool = True  # rasterize the 27x27 pair masks on
    # device from boxes[pair_idx] (exact closed form, ops/union_masks)
    # instead of building + uploading (R, 27, 27, 2) arrays from the host;
    # False restores the host path (useful for entry-level parity dumps)
    profile_steps: int = 0  # >0: capture a jax.profiler trace of this many
    # train steps (from step 2) into <save_path>/trace for TensorBoard/XProf
    device_eval: bool = False  # additionally score R@K on device during the
    # epoch eval (fast path; the host evaluator stays the reported truth)
    device_eval_promote: bool = False  # after `device_eval_burnin` videos of
    # exact host/device R@K agreement within an epoch eval, stop running the
    # host evaluator for the remaining videos and drive the plateau metric
    # (mean R@20) from the on-device scorer (eval/recall_jax). Any burn-in
    # mismatch demotes back to the full host eval for that epoch; videos
    # whose GT was bucket-truncated are always host-scored and neither
    # count toward burn-in nor demote. Final reported numbers should come
    # from tools/test_*
    # (host evaluator, the source of truth). Single-process runs only.
    device_eval_burnin: int = 16  # videos compared host-vs-device before
    # promotion takes effect (per epoch)
    device_eval_recheck: int = 64  # after promotion, host-compare every Nth
    # device-scored video (0 disables): a divergence that only manifests on
    # later videos must not silently bias the promoted plateau metric; a
    # recheck mismatch demotes for the rest of the epoch and flags the
    # epoch metric as suspect
    remat: bool = False  # rematerialize the temporal-transformer layers in
    # backward (jax.checkpoint): trades recompute FLOPs for activation
    # memory — enables bigger train batches/buckets per chip
    fused_attention: bool = False  # route the relation transformers' masked
    # attention through the Pallas fused kernel (ops/pallas_attention.py):
    # probabilities stay in VMEM fwd+bwd; dropout uses the TPU PRNG stream
    distributed: bool = False  # multi-host (multi-controller) training:
    # jax.distributed.initialize before device use; with no explicit
    # coordinator this relies on TPU-pod auto-detection. See
    # parallel/distributed.py.
    coordinator_address: str = ""  # host:port of process 0 (or env
    # NL_VSGG_COORDINATOR); setting it implies distributed=true
    num_processes: int = -1  # total processes (-1: env NL_VSGG_NUM_PROCESSES
    # or auto)
    process_id: int = -1  # this process's rank (-1: env NL_VSGG_PROCESS_ID
    # or auto)
    union_feat_cache: str = ""  # directory for an on-disk union-feature
    # cache: grounding is deterministic per video, so the VinVL union
    # extraction (the dominant per-video cost when union_box_feature is on;
    # the reference reruns it EVERY STEP, lib/assign_pseudo_label.py:1336)
    # runs once per video ever — epoch 2+ and eval re-runs read ~25 MB/video
    # from disk instead of a ~300-400 ms detector pass on the training chip
    union_feat_cache_dtype: str = "float16"  # cache storage dtype: float16
    # halves disk (~88 GB for AG train at production buckets) at ~1e-3
    # relative feature error — below the bf16 compute noise most runs use;
    # set float32 for exact-parity runs
    entry_cache: str = ""  # directory for the packed-Entry disk cache
    # (data/entry_cache.py): grounding is deterministic per video, so the
    # finished padded Entry is reusable across epochs and eval re-runs —
    # warm epochs read one ~1 MB npz per video instead of re-running the
    # host grounding pass (the reference re-grounds every step,
    # lib/assign_pseudo_label.py:27-45). Keyed on the pseudo-label pickle
    # mtime, bucket ladder, and every grounding flag; stale entries are
    # misses, never reused. union_feat (when present) is stored at
    # union_feat_cache_dtype like the union cache.
    device_entry_store_gb: float = 0.0  # >0 enables the device-resident
    # Entry store (data/device_store.py) up to this many GB of HBM: epoch 0
    # streams + fills it, later epochs gather batches HBM-to-HBM from the
    # shuffled indices alone — no host grounding, no per-batch upload.
    # Batches are bit-identical to the streamed path (tests/
    # test_device_store.py). Under a mesh the store shards each bucket over
    # the 'data' axis and gathers device-locally (per-chip resident =
    # bytes/data_par) — including multi-controller runs, where cold epochs
    # adopt the DistributedBatcher's global batches and warm epochs gather
    # SPMD (identical bookkeeping on every process; device_store.py).
    # Overflow falls back to streaming for the remainder.
    prng_impl: str = "rbg"  # PRNG for training randomness (dropout / label
    # sampling): "rbg" is ~16% faster per train step on TPU than jax's
    # default threefry2x32 (measured: 120 -> 101 ms at batch 64); both are
    # counter-based and reproducible, the streams just differ. Set
    # "threefry2x32" to reproduce runs recorded before this knob existed.

    def __post_init__(self):
        # live keys fail fast on typos ('bf16', 'fp32', ...) instead of
        # silently running the other path
        for name in ("dtype", "vinvl_dtype"):
            v = getattr(self, name)
            if v not in ("float32", "bfloat16"):
                raise ValueError(f"{name}={v!r}: expected 'float32' or 'bfloat16'")
        if self.union_feat_cache_dtype not in ("float32", "float16"):
            raise ValueError(
                f"union_feat_cache_dtype={self.union_feat_cache_dtype!r}: "
                f"expected 'float32' or 'float16'")
        if self.prng_impl not in ("rbg", "unsafe_rbg", "threefry2x32"):
            raise ValueError(f"prng_impl={self.prng_impl!r}: expected 'rbg', "
                             f"'unsafe_rbg' or 'threefry2x32'")

    def replace(self, **kw: Any) -> "Config":
        return dataclasses.replace(self, **kw)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, default=str)


def _coerce(old: Any, new: Any, key: str) -> Any:
    """Reference-compatible type coercion (lib/config.py:70-94)."""
    if old is None or new is None:
        return None if new == "None" else new
    if isinstance(old, bool):
        if isinstance(new, bool):
            return new
        if isinstance(new, str):
            return new.lower() == "true"
        return bool(new)
    if isinstance(old, (tuple, list)) and isinstance(new, str):
        return tuple(int(v) for v in new.split(","))
    if type(old) is type(new):
        return new
    if isinstance(old, float) and isinstance(new, int):
        return float(new)
    if isinstance(old, int) and isinstance(new, float) and new.is_integer():
        return int(new)
    if isinstance(old, str):
        return str(new)
    raise ValueError(f"Type mismatch ({type(old)} vs {type(new)}) for config key: {key}")


def load_config(path: str | None = None, overrides: dict[str, Any] | None = None) -> Config:
    """Build a Config from an optional YAML file plus keyword overrides.

    Unknown YAML keys are ignored with the same permissiveness as the
    reference's merge (its KeyError check is commented out, lib/config.py:67-68).
    """
    cfg = Config()
    merged: dict[str, Any] = {}

    def coerce_nested(k, v):
        """buckets/mesh from YAML mappings (e.g. tools/tune_buckets.py output):
        buckets: {max_boxes: [32, 64], ...} / mesh: {data: -1, model: 2}."""
        cls = {"buckets": BucketConfig, "mesh": MeshConfig}[k]
        if isinstance(v, cls):
            return v
        if not isinstance(v, dict):
            raise ValueError(f"config key {k} expects a mapping, got {v!r}")
        fields = {f.name: f for f in dataclasses.fields(cls)}
        unknown = set(v) - set(fields)
        if unknown:
            raise ValueError(f"unknown {k} keys: {sorted(unknown)}")
        # bucket lists sorted ascending: pick_bucket takes the first fit
        kw = {kk: tuple(sorted(int(x) for x in vv))
              if isinstance(vv, (list, tuple)) else int(vv)
              for kk, vv in v.items()}
        return cls(**kw)

    if path:
        with open(path) as f:
            raw = yaml.safe_load(f) or {}
        for k, v in raw.items():
            if k in ("buckets", "mesh"):
                merged[k] = coerce_nested(k, v)
            elif hasattr(cfg, k):
                merged[k] = _coerce(getattr(cfg, k), v, k)
    if overrides:
        for k, v in overrides.items():
            if not hasattr(cfg, k):
                raise KeyError(f"unknown config key: {k}")
            if k in ("buckets", "mesh"):
                merged[k] = coerce_nested(k, v)
            else:
                merged[k] = _coerce(getattr(cfg, k), v, k)
    return cfg.replace(**merged)

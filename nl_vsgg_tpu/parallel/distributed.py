"""Multi-host (multi-controller) SPMD training support.

The reference is strictly single-process, single-GPU (SURVEY.md §2.9: no
DP/DDP, batch = one video). The single-process path here already
data-parallelizes video batches over the local mesh (parallel/mesh.py);
this module extends the SAME train step to multi-host meshes the TPU-native
way — every process runs the same program:

  * `init_distributed` wires `jax.distributed.initialize` from config/env,
    after which `jax.devices()` is the GLOBAL device list and the existing
    mesh/sharding rules apply unchanged (XLA collectives ride ICI within a
    slice and DCN across slices; there is no hand-written comms layer).
  * `DistributedBatcher` replaces the single-host bucket batcher: each
    global batch is a FIXED block of the (seed-deterministic, identical on
    every process) epoch order; each process grounds only its contiguous
    block of videos and contributes them as the process-local shard of a
    global `jax.Array` via `jax.make_array_from_process_local_data`.
    Bucket shapes are agreed with one tiny int all-gather per batch (a
    host-side collective over (boxes, rels) hints), so every process
    compiles/executes the identical global step.
  * Videos whose grounding fails (`wk_forward -> None`, the reference's
    `entry == None` skip at tools/train_STTran.py:138) stay zero-filled
    slots; the valid-weighted train step (train/step.py) already excludes
    them from the loss/stat means, so skip handling needs NO cross-process
    control flow.
  * `merge_evaluators` all-gathers the host evaluator's per-video recall
    lists after each process scored its shard of the test split, so the
    reported R@K equals the single-process evaluation of the full split
    (the means are order-independent).

Single-process (jax.process_count() == 1) every helper degrades to a no-op
or local equivalent, so the training tools call them unconditionally.
"""

from __future__ import annotations

import dataclasses
import os
import pickle
from typing import Callable, Iterator, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data.entry import Entry, empty_entry, pad_entry
from .mesh import batch_sharding


def init_distributed(cfg=None, logger=None) -> bool:
    """Initialize JAX multi-controller mode if configured; returns True when
    running multi-process.

    Sources, in priority order:
      1. cfg.coordinator_address / cfg.num_processes / cfg.process_id
      2. env NL_VSGG_COORDINATOR / NL_VSGG_NUM_PROCESSES / NL_VSGG_PROCESS_ID
      3. cfg.distributed=true with no explicit coordinator: bare
         `jax.distributed.initialize()` (TPU pod auto-detection).

    Must run before the first device use (jax.process_count()/jax.devices()
    would otherwise lock in single-process mode — this function only touches
    the backend when multi-process is actually requested); safe to call when
    already initialized or when nothing is configured (returns the current
    multi-process status).
    """
    coord = (getattr(cfg, "coordinator_address", "") or
             os.environ.get("NL_VSGG_COORDINATOR", ""))
    nproc = int(getattr(cfg, "num_processes", -1) if cfg is not None else -1)
    if nproc < 0:
        nproc = int(os.environ.get("NL_VSGG_NUM_PROCESSES", "-1"))
    pid = int(getattr(cfg, "process_id", -1) if cfg is not None else -1)
    if pid < 0:
        pid = int(os.environ.get("NL_VSGG_PROCESS_ID", "-1"))
    want = bool(getattr(cfg, "distributed", False)) or bool(coord)
    if not want:
        return jax.process_count() > 1
    kw = {}
    if coord:
        kw["coordinator_address"] = coord
        # -1 sentinels mean "auto": jax.distributed rejects negative values,
        # but omitting them triggers its cluster auto-detection
        if nproc >= 0:
            kw["num_processes"] = nproc
        if pid >= 0:
            kw["process_id"] = pid
    try:
        jax.distributed.initialize(**kw)
    except RuntimeError as e:  # double-init (e.g. tests calling twice):
        # jax 0.9 raises "distributed.initialize should only be called once"
        msg = str(e).lower()
        if "already" not in msg and "only be called once" not in msg:
            raise
    if logger is not None:
        logger.info(f"distributed: process {jax.process_index()}/"
                    f"{jax.process_count()}, "
                    f"{jax.local_device_count()} local / "
                    f"{jax.device_count()} global devices")
    return jax.process_count() > 1


def is_primary() -> bool:
    """True on the process that should write logs/metrics/checkpoints."""
    return jax.process_index() == 0


def allgather_obj(obj) -> list:
    """All-gather an arbitrary picklable host object; returns the list of
    every process's object in process order. Single-process: [obj]."""
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), np.uint8)
    # lengths differ per process: agree on the max, pad, gather, trim
    n = np.asarray([payload.size], np.int64)
    sizes = np.asarray(multihost_utils.process_allgather(n)).reshape(-1)
    buf = np.zeros(int(sizes.max()), np.uint8)
    buf[:payload.size] = payload
    gathered = np.asarray(multihost_utils.process_allgather(buf))
    return [pickle.loads(gathered[p, :int(sizes[p])].tobytes())
            for p in range(jax.process_count())]


def merge_evaluators(evaluator) -> None:
    """Merge per-process SceneGraphEvaluator shards in place (all processes
    end up with the full split's per-video lists, in process order)."""
    state = (evaluator.recall, evaluator.recall_nogc, evaluator.semi_recall,
             evaluator.mean_recall.collect, evaluator.ng_mean_recall.collect)
    all_states = allgather_obj(state)
    if len(all_states) == 1:
        return
    for tgt_i, tgt in enumerate((evaluator.recall, evaluator.recall_nogc,
                                 evaluator.semi_recall)):
        for k in tgt:
            tgt[k] = [v for st in all_states for v in st[tgt_i][k]]
    for tgt_i, coll in ((3, evaluator.mean_recall), (4, evaluator.ng_mean_recall)):
        for k in coll.collect:
            coll.collect[k] = [
                [v for st in all_states for v in st[tgt_i][k][n]]
                for n in range(coll.num_rel)]


class DistributedBatcher:
    """Fixed-composition global video batches for multi-controller training.

    Single-host batching groups same-bucket Entries opportunistically
    (data/pipeline.py bucket_batches) — that needs no coordination because
    one process sees every video. Across processes the batch COMPOSITION
    must be agreed, so batches are fixed blocks of the shared epoch order:
    batch t = order[t*B : (t+1)*B], and process p grounds+owns the
    contiguous sub-block of B/nproc videos that maps onto its local
    devices' rows of the mesh's 'data' axis. One int all-gather per batch
    agrees the padded bucket (max over members); failed/missing slots stay
    zero (excluded from means by the valid-weighted train step).

    `ground_fn(video_index) -> Entry | None` runs on worker threads.
    Yields device-ready global Entry batches (leading axis B, sharded over
    'data').
    """

    def __init__(self, ground_fn: Callable[[int], Entry | None],
                 order: Sequence[int], batch_videos: int, mesh,
                 feat_dim: int = 2048, zero_union: bool = False,
                 rel_bf16: bool = False, num_workers: int = 4,
                 device_masks: bool = False, yield_indices: bool = False):
        # yield_indices=True yields (global_index_block, Entry) instead of
        # Entry — the device-store adoption path needs the composition
        self.yield_indices = yield_indices
        self.ground_fn = ground_fn
        self.order = list(order)
        self.B = batch_videos
        self.mesh = mesh
        self.feat_dim = feat_dim
        self.zero_union = zero_union
        # fill entries must match the real entries' spatial_masks width
        # (width-0 when the grounding path emits the device-compute sentinel)
        self.device_masks = device_masks
        self.rel_bf16 = rel_bf16
        self.num_workers = max(1, num_workers)
        self.nproc = jax.process_count()
        self.pid = jax.process_index()
        if self.B % self.nproc:
            raise ValueError(
                f"batch_videos={self.B} must be a multiple of the process "
                f"count ({self.nproc}) so every process contributes the same "
                f"number of videos per global batch")
        data_axis = mesh.shape["data"]
        if self.B % data_axis:
            raise ValueError(
                f"batch_videos={self.B} must be a multiple of the mesh data "
                f"axis ({data_axis})")
        self.per_proc = self.B // self.nproc

    def __iter__(self) -> Iterator[Entry]:
        from concurrent.futures import ThreadPoolExecutor

        from jax.experimental import multihost_utils

        sh = batch_sharding(self.mesh)
        # Fixed blocks up front; the ragged tail (< B videos) is dropped: its
        # composition would need a second set of compiled shapes per bucket,
        # and the epoch order reshuffles per epoch so no video is starved.
        blocks, chunks = [], []
        for t0 in range(0, len(self.order), self.B):
            chunk = self.order[t0:t0 + self.B]
            if len(chunk) == self.B:
                chunks.append(chunk)
                blocks.append(
                    chunk[self.pid * self.per_proc:(self.pid + 1) * self.per_proc])

        with ThreadPoolExecutor(max_workers=self.num_workers) as ex:
            pending = None
            for t, mine in enumerate(blocks):
                futs = pending or [ex.submit(self.ground_fn, i) for i in mine]
                # overlap: block t+1 grounds on the pool while block t is
                # assembled here and stepped by the caller (the single-host
                # GroundingPrefetcher's overlap, kept under the fixed
                # composition the cross-process agreement needs)
                pending = ([ex.submit(self.ground_fn, i) for i in blocks[t + 1]]
                           if t + 1 < len(blocks) else None)
                entries = []
                for i, f in zip(mine, futs):
                    try:
                        entries.append(f.result())
                    except Exception as e:
                        # one process raising here would leave the OTHERS
                        # blocked forever in the per-batch all-gather below —
                        # degrade to a skip slot (the valid-weighted step
                        # ignores it), like the single-host prefetcher
                        import logging
                        logging.getLogger("nl_vsgg").warning(
                            f"grounding video {i} failed ({e!r}) — skipped")
                        entries.append(None)
                hints = np.zeros((self.per_proc, 2), np.int32)
                for j, e in enumerate(entries):
                    if e is not None:
                        hints[j] = (e.n_boxes, e.n_rels)
                if self.nproc > 1:
                    all_hints = np.asarray(
                        multihost_utils.process_allgather(hints)).reshape(-1, 2)
                else:
                    all_hints = hints
                if not all_hints.any():
                    continue  # nothing groundable anywhere this batch
                bb = int(all_hints[:, 0].max())
                br = int(all_hints[:, 1].max())
                if self.zero_union:
                    # width-0 union channel BEFORE padding: the models'
                    # union_projection treats it as the exact bias-broadcast
                    # fast path (models/sttran.py), and pad_entry must never
                    # row-copy ~38 MB/video of zeros to the agreed global
                    # bucket only to discard them
                    entries = [e.replace(union_feat=np.zeros(
                        np.shape(e.union_feat)[:-1] + (0,), np.float32))
                        if e is not None else None for e in entries]
                local = [pad_entry(e, bb, br) if e is not None
                         else empty_entry(bb, br, self.feat_dim,
                                          with_union_feat=not self.zero_union,
                                          with_spatial_masks=not self.device_masks)
                         for e in entries]
                host = jax.tree.map(
                    lambda *xs: np.stack([np.asarray(x) for x in xs]), *local)

                def to_global(name, arr):
                    arr = np.asarray(arr)
                    if self.rel_bf16 and name in ("union_feat", "spatial_masks"):
                        arr = arr.astype(jnp.bfloat16)
                    gshape = (self.B,) + arr.shape[1:]
                    return jax.make_array_from_process_local_data(sh, arr, gshape)

                kw = {f.name: to_global(f.name, getattr(host, f.name))
                      for f in dataclasses.fields(Entry)}
                out = Entry(**kw)
                yield (chunks[t], out) if self.yield_indices else out

"""Device-resident Entry store: warm epochs gather batches ON device.

The packed-Entry disk cache (entry_cache.py) removes the warm-epoch
grounding cost; what remains on hosts behind a slow link is the per-batch
UPLOAD — at the production bucket a b64 batch ships ~67 MB of RoI features
every step, and the features are CONSTANT across epochs (grounding is
deterministic per video). The reference re-uploads everything every step of
every epoch (/root/reference/tools/train_STTran.py:121-203 after a per-step
np.load, lib/assign_pseudo_label.py:27-45).

Here epoch 0 stacks each bucket's grounded Entries into ONE device-resident
pytree (leading axis = videos); every later epoch sends only the shuffled
VIDEO INDICES (a few hundred bytes) and the batch is assembled by an
on-device gather feeding the train step directly — HBM-to-HBM, no host
copy, no PCIe/tunnel transfer, no H2D latency. At real AG scale the train
split is ~7.4 GB fp32 (~3.9 GB with bf16 features) against 16 GB of v5e
HBM; under data parallelism each device only ever consumes its own shard of
videos, so the store shards with the data axis and scales out with the mesh
— the natural TPU layout for an epoch-replayed dataset.

`budget_bytes` caps the store; when the split does not fit, callers fall
back to streaming uploads (place_entries) — the store is a cache tier, not
a correctness dependency. Gather semantics are exact: the gathered batch is
bit-identical to place_entries over the same videos (tests/
test_device_store.py), modulo an explicit opt-in bf16 cast of `features`
(feats_bf16) whose effect is the same rounding a bf16-upload would apply.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .entry import Entry


def _bucket_key(e: Entry) -> tuple:
    return tuple(np.shape(getattr(e, f.name))
                 for f in dataclasses.fields(Entry))


class DeviceEntryStore:
    """Per-bucket stacked Entry pytrees resident on device.

    Build incrementally with `add` (e.g. while the cold epoch streams), then
    `seal()`. `gather(indices)` returns a batched Entry on device; indices
    are host ints mapped through the store's per-bucket row order.
    """

    def __init__(self, budget_bytes: int | None = None,
                 feats_bf16: bool = False, rel_bf16: bool = False):
        self.budget = budget_bytes
        self.feats_bf16 = feats_bf16
        self.rel_bf16 = rel_bf16
        self._pending: dict[tuple, list[tuple[int, Entry]]] = {}
        self._stores: dict[tuple, Entry] = {}
        self._row_of: dict[int, tuple[tuple, int]] = {}
        self._bytes = 0
        self.overflow = False

    def _entry_bytes(self, e: Entry) -> int:
        n = 0
        for f in dataclasses.fields(Entry):
            v = np.asarray(getattr(e, f.name))
            width = v.dtype.itemsize
            if f.name == "features" and self.feats_bf16:
                width = 2
            if f.name in ("union_feat", "spatial_masks") and self.rel_bf16:
                width = 2
            n += v.size * width
        return n

    def add(self, video_idx: int, e: Entry) -> bool:
        """Queue one host Entry. Returns False (and stores nothing further)
        once the byte budget is exceeded — the epoch loop keeps streaming."""
        if self.overflow:
            return False
        nb = self._entry_bytes(e)
        if self.budget is not None and self._bytes + nb > self.budget:
            self.overflow = True
            return False
        self._bytes += nb
        self._pending.setdefault(_bucket_key(e), []).append((video_idx, e))
        return True

    def seal(self) -> None:
        """Stack pending entries per bucket and place them on device."""
        big = jnp.bfloat16
        for key, items in self._pending.items():
            entries = [e for _, e in items]
            host = jax.tree.map(
                lambda *xs: np.stack([np.asarray(x) for x in xs]), *entries)
            if self.feats_bf16:
                host = host.replace(features=host.features.astype(big))
            if self.rel_bf16:
                host = host.replace(
                    union_feat=host.union_feat.astype(big),
                    spatial_masks=host.spatial_masks.astype(big))
            dev = jax.tree.map(jnp.asarray, host)
            if key in self._stores:
                old = self._stores[key]
                offset = int(np.shape(old.boxes)[0])
                dev = jax.tree.map(lambda a, b: jnp.concatenate([a, b]),
                                   old, dev)
            else:
                offset = 0
            self._stores[key] = dev
            for r, (vid, _) in enumerate(items):
                self._row_of[vid] = (key, offset + r)
        self._pending.clear()

    def __contains__(self, video_idx: int) -> bool:
        return video_idx in self._row_of

    @property
    def bytes(self) -> int:
        return self._bytes

    def rows_for(self, indices) -> tuple[tuple, np.ndarray] | None:
        """Map video indices to (bucket_key, row array) — None unless ALL
        indices live in the store AND share one bucket (a place_entries
        batch is same-bucket by construction, data/pipeline.bucket_batches)."""
        rows, keys = [], set()
        for i in indices:
            hit = self._row_of.get(int(i))
            if hit is None:
                return None
            keys.add(hit[0])
            rows.append(hit[1])
        if len(keys) != 1:
            return None
        return next(iter(keys)), np.asarray(rows, np.int32)

    def plan_batches(self, order, batch_size: int
                     ) -> tuple[list[list[int]], list[int]]:
        """Group `order` into same-bucket index batches (bucket_batches
        semantics over stored rows). Returns (batches, misses): misses are
        indices not in the store — the caller streams them through the
        ground->place path, mixing tiers freely within one epoch."""
        pending: dict[tuple, list[int]] = {}
        batches: list[list[int]] = []
        misses: list[int] = []
        for i in order:
            hit = self._row_of.get(int(i))
            if hit is None:
                misses.append(int(i))
                continue
            q = pending.setdefault(hit[0], [])
            q.append(int(i))
            if len(q) == batch_size:
                batches.append(pending.pop(hit[0]))
        batches.extend(pending.values())
        return batches, misses

    def gather(self, indices) -> Entry | None:
        """Batched Entry for `indices` (same bucket), assembled on device.

        The take is jit-cached per (bucket, batch size); only the (B,) int32
        row vector crosses the host-device link.
        """
        hit = self.rows_for(indices)
        if hit is None:
            return None
        key, rows = hit
        return _gather_jit(self._stores[key], jnp.asarray(rows))


@jax.jit
def _gather_jit(store: Entry, rows: jnp.ndarray) -> Entry:
    return jax.tree.map(lambda a: jnp.take(a, rows, axis=0), store)

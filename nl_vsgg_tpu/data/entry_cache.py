"""Packed-Entry disk cache: warm epochs skip host grounding entirely.

Grounding is deterministic per video — the same argument that justified the
union-feature cache (grounding.py:_resolve_union_features): given the same
frame features, pseudo labels, bucket ladder, and grounding flags, wk_forward
produces the identical padded Entry every epoch. The reference re-runs the
whole host pipeline every step of every epoch
(/root/reference/tools/train_STTran.py:121-203 calling
lib/assign_pseudo_label.py:27-45's per-step np.load + python grounding loops);
here epoch 1 writes each video's finished Entry to disk and every later epoch
(and eval re-run) reads it back — the warm-epoch host cost drops from a full
grounding pass (~3.4 ms/video native, ~24 ms python) to one ~1 MB npz read,
so training stops being host-grounding-bound on few-core hosts
(BENCH train_e2e row).

Cache layout: one .npz per video under <root>/<split>/, holding every Entry
field plus a fingerprint of the inputs that determine the result. A key
mismatch (changed pseudo labels, bucket ladder, feat path, flags, or cache
format) is a miss — the stale file is overwritten, never trusted. Videos that
ground to None (no relations — build_entry's :1302-1304 twin) are cached as a
tombstone so warm epochs skip them without re-grounding. Bucket-truncation
counts are stored and replayed to the per-epoch TruncationCounter, keeping the
"labels dropped" warning accurate on cache hits.

Writes are atomic (tmp + os.replace) so concurrent prefetch workers or
multi-process trainers sharing one cache directory cannot tear a file.
"""

from __future__ import annotations

import dataclasses
import hashlib
import os

import numpy as np

from .entry import Entry

# bump when the cached layout or grounding semantics change: old files
# become misses, never wrong entries
_FORMAT_VERSION = 2  # v2: all-zero union_feat stored as a shape marker

# fields stored at reduced precision when full-width (the same tradeoff and
# dtype knob as the union-feature cache, utils/config.py union_feat_cache_dtype)
_UNION_FIELD = "union_feat"


class _Miss:
    """Sentinel distinguishing 'not cached' from a cached None entry."""

    __slots__ = ()

    def __repr__(self):  # pragma: no cover
        return "MISS"


MISS = _Miss()


class EntryCache:
    """Per-video packed-Entry store.

    `key` must encode everything that determines the grounded Entry: the
    dataset identity (pseudo-label pickle path + mtime, frame-features path),
    grounding flags (pseudo_way, feat_dim, device_spatial_masks), the bucket
    ladder, and the union-feature provider identity (or 'none'). Build it
    with `entry_cache_key`.
    """

    def __init__(self, root: str, split: str, key: str,
                 union_dtype: str = "float16"):
        self.dir = os.path.join(root, split)
        self.fingerprint = hashlib.sha1(
            f"v{_FORMAT_VERSION}:{key}".encode()).hexdigest()
        if union_dtype not in ("float32", "float16"):
            raise ValueError(f"union_dtype={union_dtype!r}")
        self.union_dtype = union_dtype
        self.hits = 0
        self.misses = 0

    def path(self, video_id: str) -> str:
        return os.path.join(self.dir, str(video_id).replace("/", "_") + ".npz")

    def load(self, video_id: str):
        """-> (Entry | None, (trunc_boxes, trunc_rels)) on a hit, MISS else."""
        p = self.path(video_id)
        if not os.path.exists(p):
            self.misses += 1
            return MISS
        try:
            with np.load(p) as z:
                if str(z["__key__"]) != self.fingerprint:
                    self.misses += 1
                    return MISS
                trunc = tuple(int(v) for v in z["__trunc__"])
                if bool(z["__none__"]):
                    self.hits += 1
                    return None, trunc
                kw = {}
                zero_union = "__union_zero_shape__" in z.files
                for f in dataclasses.fields(Entry):
                    if f.name == _UNION_FIELD and zero_union:
                        # no-provider grounding: the union block is all
                        # zeros — reconstruct via calloc instead of reading
                        # ~19 MB of stored zeros back per video per epoch
                        kw[f.name] = np.zeros(
                            tuple(z["__union_zero_shape__"]), np.float32)
                        continue
                    v = z[f.name]
                    if f.name == _UNION_FIELD and v.dtype != np.float32:
                        v = v.astype(np.float32)
                    kw[f.name] = v if v.shape else v[()]
                self.hits += 1
                return Entry(**kw), trunc
        except (KeyError, ValueError, OSError, EOFError):
            # torn/foreign file: treat as a miss and let store() replace it
            self.misses += 1
            return MISS

    def store(self, video_id: str, entry: Entry | None,
              trunc: tuple[int, int] = (0, 0)) -> None:
        os.makedirs(self.dir, exist_ok=True)
        p = self.path(video_id)
        payload = {"__key__": self.fingerprint,
                   "__none__": entry is None,
                   "__trunc__": np.asarray(trunc, np.int64)}
        if entry is not None:
            for f in dataclasses.fields(Entry):
                v = np.asarray(getattr(entry, f.name))
                if f.name == _UNION_FIELD and v.size and not v.any():
                    # all-zero union block (no union provider): a shape
                    # marker replaces ~19 MB of zeros — the dominant cost of
                    # both the store and every warm-epoch load
                    payload["__union_zero_shape__"] = np.asarray(
                        v.shape, np.int64)
                    continue
                if f.name == _UNION_FIELD and v.shape[-1] \
                        and self.union_dtype != "float32":
                    v = v.astype(self.union_dtype)
                payload[f.name] = v
        tmp = f"{p}.{os.getpid()}.tmp.npz"
        # uncompressed savez: the zlib pass costs more host time than the
        # disk it saves on this 1-core host, and warm-epoch load speed is
        # the whole point
        np.savez(tmp, **payload)
        os.replace(tmp, p)


def entry_cache_key(cfg, is_train: bool, union_key: str) -> str:
    """Fingerprint input for EntryCache from a Config (utils/config.py).

    Includes the pseudo-label pickle's mtime (train labels change ->
    invalidate) and every grounding-relevant flag; `union_key` is the union
    provider identity string already used by the union-feature cache
    ('' when union features are off/zero).
    """
    pl = str(cfg.pseudo_localized_SG_path)
    try:
        pl_mtime = int(os.path.getmtime(pl))
    except OSError:
        pl_mtime = 0
    return ":".join([
        str(cfg.data_path), str(cfg.frame_features_path),
        f"{pl}@{pl_mtime}" if is_train else "eval",
        f"feat{cfg.feat_dim}", f"pw{cfg.pseudo_way}",
        f"boxes{cfg.buckets.max_boxes}", f"rels{cfg.buckets.max_rels}",
        f"devmasks{cfg.device_spatial_masks}",
        f"union[{union_key or 'none'}:{cfg.union_feat_cache_dtype}]",
        "pickexact",  # r4: rungs picked from exact post-grounding counts
    ])

"""The Entry pytree — the grounding->model contract, redesigned for XLA.

The reference passes a ragged python dict of cuda tensors between the
grounding engine and the relation models (lib/object_detector.py:126-171,
lib/assign_pseudo_label.py:1368-1382). Here the same information is a padded,
fixed-shape pytree so the whole model + loss compiles once per bucket:

  * ragged box/relation lists  -> (N, ...) / (R, ...) arrays + boolean masks
  * python relationship-id lists (attention_gt etc.) -> multi-hot matrices
  * frame membership (`boxes[:, 0]`, `im_idx`) -> explicit int32 vectors

Feature-map-shaped tensors are channel-last (R, 7, 7, C): the TPU layout.
Padded rows are all-zero with mask False; every consumer masks (never relies
on padding values).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np
from flax import struct

from . import schema

FEAT_DIM = 2048
POOL = 7
MASK_P = 27


@struct.dataclass
class Entry:
    """One (optionally batched) video's grounded detections + relation slots."""

    # boxes -------------------------------------------------------- (N, ...)
    boxes: jnp.ndarray        # (N, 4) xyxy in feature-extractor image coords
    box_frame: jnp.ndarray    # (N,) int32 frame index of each box
    box_mask: jnp.ndarray     # (N,) bool
    labels: jnp.ndarray       # (N,) int32, 1..36 (0 = padding)
    scores: jnp.ndarray       # (N,) float32 detector confidence
    distribution: jnp.ndarray  # (N, 36) float32 class distribution (no bg)
    features: jnp.ndarray     # (N, FEAT_DIM) float32 RoI features
    # relations ---------------------------------------------------- (R, ...)
    pair_idx: jnp.ndarray     # (R, 2) int32 indices into boxes (person, obj)
    im_idx: jnp.ndarray       # (R,) int32 frame index of each relation
    rel_mask: jnp.ndarray     # (R,) bool
    union_feat: jnp.ndarray   # (R, POOL, POOL, FEAT_DIM) float32; channel
    # width 0 = "logically all-zeros" (no union-feature provider): the models
    # reduce the projection to its exact bias broadcast (union_projection)
    spatial_masks: jnp.ndarray  # (R, MASK_P, MASK_P, 2) float32; channel
    # width 0 = "compute on device": the models rasterize the exact masks
    # from boxes[pair_idx] (ops/union_masks), so the (R, 27, 27, 2) array is
    # neither built on the host nor uploaded (models/sttran.spatial_mask_input)
    attention_gt: jnp.ndarray   # (R, 3) float32 multi-hot
    spatial_gt: jnp.ndarray     # (R, 6) float32 multi-hot
    contacting_gt: jnp.ndarray  # (R, 17) float32 multi-hot
    # video-level scalars
    num_frames: jnp.ndarray   # () int32

    @property
    def n_boxes(self) -> int:
        return self.boxes.shape[-2]

    @property
    def n_rels(self) -> int:
        return self.pair_idx.shape[-2]


def empty_entry(n_boxes: int, n_rels: int, feat_dim: int = FEAT_DIM,
                with_union_feat: bool = True,
                with_spatial_masks: bool = True) -> Entry:
    """All-padding Entry of the given bucket shape (numpy-backed).

    `with_union_feat=False` / `with_spatial_masks=False` emit the width-0
    sentinel forms of the two derived arrays (see Entry field comments) so a
    fill video matches the real entries it is batched with.
    """
    z = np.zeros
    return Entry(
        boxes=z((n_boxes, 4), np.float32),
        box_frame=z((n_boxes,), np.int32),
        box_mask=z((n_boxes,), bool),
        labels=z((n_boxes,), np.int32),
        scores=z((n_boxes,), np.float32),
        distribution=z((n_boxes, schema.NUM_OBJ_CLASSES - 1), np.float32),
        features=z((n_boxes, feat_dim), np.float32),
        pair_idx=z((n_rels, 2), np.int32),
        im_idx=z((n_rels,), np.int32),
        rel_mask=z((n_rels,), bool),
        union_feat=z((n_rels, POOL, POOL, feat_dim) if with_union_feat
                     else (n_rels, POOL, POOL, 0), np.float32),
        spatial_masks=z((n_rels, MASK_P, MASK_P, 2) if with_spatial_masks
                        else (n_rels, MASK_P, MASK_P, 0), np.float32),
        attention_gt=z((n_rels, schema.NUM_ATTENTION), np.float32),
        spatial_gt=z((n_rels, schema.NUM_SPATIAL), np.float32),
        contacting_gt=z((n_rels, schema.NUM_CONTACTING), np.float32),
        num_frames=np.int32(0),
    )


def pick_bucket(sizes: tuple[int, ...], n: int) -> int:
    """Smallest bucket >= n (last bucket truncates, reported by the caller)."""
    for s in sizes:
        if n <= s:
            return s
    return sizes[-1]


def pick_joint_bucket(box_sizes, rel_sizes, n_boxes: int, n_rels: int
                      ) -> tuple[int, int]:
    """Smallest shared ladder RUNG fitting both exact counts.

    Pairing the two ladders by rung index keeps the compiled-shape count at
    |ladder| (one train-step compile per rung) instead of |boxes| x |rels|
    combinations. Exact post-grounding counts fill buckets ~2-3x better
    than the pre-grounding detection-count hint (the hint counts every raw
    detection; grounding keeps only the person + GT-matched objects —
    tools/tune_buckets.py evidence run)."""

    def idx(sizes, n):
        for i, s in enumerate(sizes):
            if n <= s:
                return i
        return len(sizes) - 1

    i = max(idx(box_sizes, n_boxes), idx(rel_sizes, n_rels))
    return (box_sizes[min(i, len(box_sizes) - 1)],
            rel_sizes[min(i, len(rel_sizes) - 1)])


def pad_entry(e: Entry, n_boxes: int, n_rels: int) -> Entry:
    """Pad (or truncate, keeping the first rows) every field to bucket shape."""

    def fit(a: np.ndarray, n: int) -> np.ndarray:
        a = np.asarray(a)
        if a.shape[0] >= n:
            return a[:n]
        # zeros + row copy, NOT np.pad: numpy's pad writes the pad area
        # through a generic slow path — it was 88% of wk_forward's time at
        # production shapes (the (R,7,7,2048) union_feat alone is 38 MB).
        # calloc-backed zeros never touch the pad pages.
        out = np.zeros((n,) + a.shape[1:], a.dtype)
        out[: a.shape[0]] = a
        return out

    kw = {}
    for f in dataclasses.fields(Entry):
        v = getattr(e, f.name)
        if f.name == "num_frames":
            kw[f.name] = v
        elif f.name in ("pair_idx", "im_idx", "rel_mask", "union_feat", "spatial_masks",
                        "attention_gt", "spatial_gt", "contacting_gt"):
            kw[f.name] = fit(v, n_rels)
        else:
            kw[f.name] = fit(v, n_boxes)
    # clamp pair indices that point past a truncated box table
    pi = np.asarray(kw["pair_idx"])
    rm = np.asarray(kw["rel_mask"]) & (pi < n_boxes).all(axis=-1)
    kw["pair_idx"] = np.where(rm[:, None], pi, 0).astype(np.int32)
    kw["rel_mask"] = rm
    return Entry(**kw)

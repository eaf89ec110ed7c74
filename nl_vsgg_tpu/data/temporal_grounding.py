"""Temporal pseudo-grounding: propagate grounded boxes across frames.

Rebuilds the propagation math of the reference's temporal grounding family
(lib/assign_pseudo_label.py:224-891 — temporal_pseudo_obj_grounded_out and
its people/_t variants): starting from the frames where a class is already
grounded, walk forward (and backward) frame by frame; in each new frame the
candidate detections are those with IoU(previous box, candidate) > threshold
(or, with force_ground, at least the best-IoU candidate); among candidates
the one with maximum cosine feature similarity wins, and its confidence is
the source confidence decayed by the IoU. Crucially the propagation is
*order-dependent*: the newly grounded box becomes the source for the next
frame (the reference mutates video_object_det as it goes) — so this is a
sequential scan, not a parallel map.

Note: none of the reference's entry points call this family (its calls are
commented out / absent — PARITY.md §2.5); it is provided for capability
parity with `pseudo_way`-style experiments. Host-side numpy: it is offline
per-video preprocessing over ragged detection lists.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .grounding import FrameDetections


@dataclass
class PropagatedBox:
    frame: int
    rect: np.ndarray
    conf: float
    feat: np.ndarray


def _iou_1_to_many(box: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    """torchvision box_iou convention (0-area, models/box_ops.py:34-47)."""
    a1 = (box[2] - box[0]) * (box[3] - box[1])
    a2 = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    iw = (np.minimum(box[2], boxes[:, 2]) - np.maximum(box[0], boxes[:, 0])).clip(min=0)
    ih = (np.minimum(box[3], boxes[:, 3]) - np.maximum(box[1], boxes[:, 1])).clip(min=0)
    inter = iw * ih
    return inter / np.maximum(a1 + a2 - inter, 1e-12)


def _cosine_1_to_many(feat: np.ndarray, feats: np.ndarray) -> np.ndarray:
    return (feat @ feats.T) / (np.linalg.norm(feat)
                               * np.maximum(np.linalg.norm(feats, axis=1), 1e-12))


def propagate(frames: list[FrameDetections], seeds: dict[int, list[PropagatedBox]],
              frame_order: list[int], skip_frames: set[int],
              threshold: float = 0.5, force_ground: bool = False
              ) -> dict[int, list[PropagatedBox]]:
    """One directional pass. `seeds[f]` holds the source boxes entering the
    walk; each visited frame (not in skip_frames) receives one propagated box
    per live source, and the propagated boxes become the next sources.

    Returns {frame: [PropagatedBox...]} of newly grounded boxes.
    """
    # Reference source update (lib/assign_pseudo_label.py:267-268 "Update"):
    # after EVERY visited frame the source set becomes that frame's class
    # boxes — the newly propagated ones for walked frames, the known
    # grounding (`seeds`) for skipped frames. A frame where the IoU gate
    # admits nothing therefore KILLS the chain; it must not bridge the gap
    # with a stale source (the walk would ground boxes the reference math
    # never produces).
    out: dict[int, list[PropagatedBox]] = {}
    sources: list[PropagatedBox] = []
    for f in frame_order:
        if f in seeds:
            sources = seeds[f]
        if f in skip_frames:
            continue
        dets = frames[f]
        if not sources or len(dets.classes) == 0:
            sources = []  # Update: no class boxes at f -> chain dead
            continue
        for src in sources:
            ious = _iou_1_to_many(np.asarray(src.rect, np.float64),
                                  dets.rects.astype(np.float64))
            cand = ious > threshold
            if force_ground:
                cand[ious.argmax()] = True  # :252-254
            if not cand.any():
                continue
            sims = _cosine_1_to_many(np.asarray(src.feat, np.float64),
                                     dets.feats.astype(np.float64))
            local = np.where(cand)[0]
            pick = local[sims[local].argmax()]
            pb = PropagatedBox(frame=f, rect=dets.rects[pick].copy(),
                               conf=float(src.conf) * float(ious[pick]),
                               feat=dets.feats[pick].copy())
            out.setdefault(f, []).append(pb)
        sources = out.get(f, [])  # Update (:268)
    return out


def temporal_pseudo_ground(frames: list[FrameDetections],
                           grounded_frames: dict[int, list[PropagatedBox]],
                           threshold: float = 0.5,
                           force_ground: bool = False
                           ) -> dict[int, list[PropagatedBox]]:
    """Both-direction propagation from the grounded span's edges
    (the forward/backward walks of temporal_pseudo_obj_grounded_out,
    lib/assign_pseudo_label.py:237-301)."""
    if not grounded_frames:
        return {}
    known = sorted(grounded_frames)
    lo, hi = known[0], known[-1]
    n = len(frames)
    fwd = propagate(frames, {hi + 1: grounded_frames[hi]},
                    list(range(hi + 1, n)), set(grounded_frames),
                    threshold, force_ground)
    bwd = propagate(frames, {lo - 1: grounded_frames[lo]},
                    list(range(lo - 1, -1, -1)), set(grounded_frames),
                    threshold, force_ground)
    out = dict(fwd)
    for f, boxes in bwd.items():
        out.setdefault(f, []).extend(boxes)
    return out

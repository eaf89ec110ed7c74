"""RoI box head: C5 feature extractor + 1595-class predictor + postprocess.

Rebuilds the VinVL AttrRCNN box pipeline (models/vinvl/vinvl_x152c4.yaml):

  * pooler: RoIAlign 14x14, scale 1/16 over the C4 map (our XLA roi_align)
  * feature extractor: ResNeXt stage-5 -> (7, 7, 2048); mean-pooled 2048-d
    per-box features are exactly what the reference caches as feat.npy
    (NL-VSGG/data_preprocess/extract_bbox_features_ag.py:108-120)
  * predictor: cls_score (1595) + bbox_pred (1595*4)
  * postprocess: softmax scores, per-class box decode with weights
    (10, 10, 5, 5), clip, SCORE_THRESH 0.2, per-class NMS 0.5,
    DETECTIONS_PER_IMG 100 / MIN_DETECTIONS_PER_IMG 10 — fixed-shape
    (padded candidates + top-k) instead of dynamic keep lists.
"""

from __future__ import annotations

from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.roi_align_mm import roi_align_mm
from .resnet import ResNeXtC5Head
from .rpn import clip_to_image, decode_boxes

NUM_CLASSES = 1595


class BoxPredictor(nn.Module):
    num_classes: int = NUM_CLASSES

    @nn.compact
    def __call__(self, pooled: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        # pooled: (N, 7, 7, 2048) -> avg pool -> heads
        x = pooled.mean(axis=(-3, -2))
        scores = nn.Dense(self.num_classes, name="cls_score")(x)
        deltas = nn.Dense(self.num_classes * 4, name="bbox_pred")(x)
        return scores, deltas


class RoIBoxHead(nn.Module):
    """pooler + C5 + predictor. Returns (cls_logits, box_deltas, box_feats).

    `dtype` is the C5 compute dtype (bf16 when the facade runs in its
    fast-extraction mode): the RoIAlign geometry and the class/box predictor
    heads stay fp32; only the grouped-conv C5 stage — the expensive,
    memory-bound part — runs in the reduced precision.
    """

    groups: int = 32
    dtype: jnp.dtype | None = None

    def setup(self):
        self.head = ResNeXtC5Head(self.groups)
        self.predictor = BoxPredictor()

    def _c5(self, crops: jnp.ndarray) -> jnp.ndarray:
        if self.dtype is not None:
            crops = crops.astype(self.dtype)
        return self.head(crops).astype(jnp.float32)

    def __call__(self, c4: jnp.ndarray, boxes: jnp.ndarray):
        crops = roi_align_mm(c4, boxes, output_size=(14, 14), spatial_scale=1.0 / 16)
        feats77 = self._c5(crops)  # (N, 7, 7, 2048)
        logits, deltas = self.predictor(feats77)
        return logits, deltas, feats77

    def head_apply(self, crops: jnp.ndarray) -> jnp.ndarray:
        return self._c5(crops)


@partial(jax.jit, static_argnames=("max_dets", "min_dets"))
def postprocess_detections(cls_logits: jnp.ndarray, box_deltas: jnp.ndarray,
                           proposals: jnp.ndarray, proposal_valid: jnp.ndarray,
                           im_hw: jnp.ndarray, score_thresh: float = 0.2,
                           nms_thresh: float = 0.5, max_dets: int = 100,
                           min_dets: int = 10):
    """-> dict(boxes (max_dets, 4), scores, labels, box_index, valid).

    `labels` are 1..1594 (background column dropped); `box_index` maps each
    detection back to its source proposal row (for feature lookup).
    Mirrors maskrcnn PostProcessor + the MIN_DETECTIONS_PER_IMG fallback:
    if fewer than min_dets pass the 0.2 threshold, the highest-scoring
    below-threshold candidates fill the quota.
    """
    from ..ops.nms import nms_topk

    n, c = cls_logits.shape
    probs = jax.nn.softmax(cls_logits, axis=-1)
    deltas = box_deltas.reshape(n, c, 4)
    boxes = decode_boxes(proposals[:, None, :], deltas, weights=(10.0, 10.0, 5.0, 5.0))
    boxes = clip_to_image(boxes, im_hw[0], im_hw[1])

    # flatten (proposal, class>0) candidates
    cand_scores = probs[:, 1:].reshape(-1)
    cand_boxes = boxes[:, 1:, :].reshape(-1, 4)
    cand_labels = jnp.tile(jnp.arange(1, c, dtype=jnp.int32), (n,))
    cand_rows = jnp.repeat(jnp.arange(n, dtype=jnp.int32), c - 1)
    cand_valid = jnp.repeat(proposal_valid, c - 1)

    # cap the NMS working set: top 4*max_dets candidates by score
    k = min(4 * max_dets, cand_scores.shape[0])
    top_scores, top_idx = jax.lax.top_k(jnp.where(cand_valid, cand_scores, -1.0), k)
    tboxes = cand_boxes[top_idx]
    tlabels = cand_labels[top_idx]
    trows = cand_rows[top_idx]
    tvalid = top_scores > 0

    # per-class greedy NMS, first max_dets survivors only (already in score
    # order, so the survivors come out ranked)
    kept_idx, kept_ok = nms_topk(tboxes, top_scores, nms_thresh, k=max_dets,
                                 valid=tvalid, class_ids=tlabels, plus_one=True)
    kept_scores = jnp.where(kept_ok, top_scores[kept_idx], -1.0)
    # min-detections fallback: keep all above thresh, else fill to min_dets
    above = kept_ok & (kept_scores > score_thresh)
    n_above = above.sum()
    quota = jnp.maximum(jnp.minimum(min_dets, kept_ok.sum()), n_above)
    out_valid = jnp.arange(max_dets) < quota
    return {
        "boxes": tboxes[kept_idx],
        "scores": top_scores[kept_idx],
        "labels": tlabels[kept_idx],
        "box_index": trows[kept_idx],
        "valid": out_valid,
    }

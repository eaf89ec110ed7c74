"""Region Proposal Network over the C4 feature map (single level), flax.

Rebuilds maskrcnn_benchmark's RPNHead + proposal selection for the VinVL
config (models/vinvl/vinvl_x152c4.yaml: PRE_NMS_TOP_N_TEST 6000,
POST_NMS_TOP_N_TEST 300; maskrcnn defaults NMS 0.7, MIN_SIZE 0, box-coder
weights (1, 1, 1, 1), BBOX_XFORM_CLIP log(1000/16)) as fixed-shape XLA:
top-k instead of dynamic filtering, padded NMS mask instead of keep lists.
"""

from __future__ import annotations

import math
from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.nms import nms_mask

BBOX_XFORM_CLIP = math.log(1000.0 / 16)


class RPNHead(nn.Module):
    """3x3 conv + 1x1 objectness / box-delta heads (15 anchors)."""

    num_anchors: int = 15

    @nn.compact
    def __call__(self, fmap: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        t = nn.relu(nn.Conv(fmap.shape[-1], (3, 3), padding=((1, 1), (1, 1)),
                            name="conv")(fmap))
        logits = nn.Conv(self.num_anchors, (1, 1), name="cls_logits")(t)
        deltas = nn.Conv(self.num_anchors * 4, (1, 1), name="bbox_pred")(t)
        return logits, deltas


def decode_boxes(anchors: jnp.ndarray, deltas: jnp.ndarray,
                 weights=(1.0, 1.0, 1.0, 1.0)) -> jnp.ndarray:
    """maskrcnn BoxCoder.decode: (dx, dy, dw, dh) on +1-convention anchors."""
    wx, wy, ww, wh = weights
    widths = anchors[..., 2] - anchors[..., 0] + 1.0
    heights = anchors[..., 3] - anchors[..., 1] + 1.0
    ctr_x = anchors[..., 0] + 0.5 * widths
    ctr_y = anchors[..., 1] + 0.5 * heights
    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = jnp.clip(deltas[..., 2] / ww, max=BBOX_XFORM_CLIP)
    dh = jnp.clip(deltas[..., 3] / wh, max=BBOX_XFORM_CLIP)
    pred_ctr_x = dx * widths + ctr_x
    pred_ctr_y = dy * heights + ctr_y
    pred_w = jnp.exp(dw) * widths
    pred_h = jnp.exp(dh) * heights
    return jnp.stack([pred_ctr_x - 0.5 * pred_w,
                      pred_ctr_y - 0.5 * pred_h,
                      pred_ctr_x + 0.5 * pred_w - 1.0,
                      pred_ctr_y + 0.5 * pred_h - 1.0], axis=-1)


def clip_to_image(boxes: jnp.ndarray, im_h: float, im_w: float) -> jnp.ndarray:
    x1 = jnp.clip(boxes[..., 0], 0, im_w - 1)
    y1 = jnp.clip(boxes[..., 1], 0, im_h - 1)
    x2 = jnp.clip(boxes[..., 2], 0, im_w - 1)
    y2 = jnp.clip(boxes[..., 3], 0, im_h - 1)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


@partial(jax.jit, static_argnames=("pre_nms_top_n", "post_nms_top_n"))
def select_proposals(anchors: jnp.ndarray, objectness: jnp.ndarray,
                     deltas: jnp.ndarray, im_hw: jnp.ndarray,
                     pre_nms_top_n: int = 6000, post_nms_top_n: int = 300,
                     nms_thresh: float = 0.7) -> tuple[jnp.ndarray, jnp.ndarray]:
    """anchors (K, 4), objectness (K,) logits, deltas (K, 4) ->
    (post_nms_top_n, 4) proposals + (post_nms_top_n,) valid mask.

    Fixed-shape: top-k pre-NMS, padded NMS, top-k post-NMS.
    """
    k = min(pre_nms_top_n, objectness.shape[0])
    scores = jax.nn.sigmoid(objectness)
    top_scores, top_idx = jax.lax.top_k(objectness, k)
    boxes = decode_boxes(anchors[top_idx], deltas[top_idx])
    boxes = clip_to_image(boxes, im_hw[0], im_hw[1])
    # remove_small_boxes(min_size=0): only degenerate (negative) boxes drop
    ws = boxes[..., 2] - boxes[..., 0] + 1
    hs = boxes[..., 3] - boxes[..., 1] + 1
    valid = (ws >= 0) & (hs >= 0)
    # only the top post_nms_top_n survivors matter -> O(post) sequential NMS
    from ..ops.nms import nms_topk
    n_out = min(post_nms_top_n, k)
    out_idx, ok = nms_topk(boxes, scores[top_idx], nms_thresh, k=n_out,
                           valid=valid, plus_one=True)
    return boxes[out_idx], ok

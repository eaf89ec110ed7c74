"""DETR-style Hungarian matching (lib/matcher.py).

The cost matrix — cosine distance of class distributions, cosine distance of
RoI features, L1 of cxcywh boxes, minus generalized IoU (:125-146) — is pure
array math and jit-compiles; the LSAP solve has two backends:

  * `solve_lsap_host`: scipy.optimize.linear_sum_assignment, bit-exact with
    the reference (:149). Used by the host-side tracker.
  * `solve_lsap_auction`: a jittable auction-algorithm approximation for
    on-device matching (fixed iteration count, padded costs). Matches scipy
    on non-degenerate costs; tested against it.

The reference converts boxes with `box_xywh_to_cxcywh` even though entry
boxes are xyxy (:122-124) — that quirk belongs to its caller (lib/track.py);
`match()` here takes whatever layout the caller supplies, like the original.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.boxes import generalized_iou


def xywh_to_cxcywh(b: jnp.ndarray) -> jnp.ndarray:
    x, y, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([x + w / 2, y + h / 2, w, h], axis=-1)


def cxcywh_to_xyxy(b: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def cosine_cost(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """1 - cosine similarity (cost_matrix_torch, lib/matcher.py:70-78)."""
    xn = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)
    yn = y / (jnp.linalg.norm(y, axis=-1, keepdims=True) + 1e-12)
    return 1.0 - xn @ yn.T


@dataclass(frozen=True)
class HungarianMatcher:
    """lib/matcher.py:81-150; train_DSG_DETR.py uses (0.5, 1, 1, 0.5)."""

    cost_class: float = 1.0
    cost_feature: float = 1.0
    cost_bbox: float = 1.0
    cost_giou: float = 1.0

    def cost_matrix(self, out_boxes_xywh, out_feats, out_dists,
                    tgt_boxes_xywh, tgt_feats, tgt_dists) -> jnp.ndarray:
        ob = xywh_to_cxcywh(jnp.asarray(out_boxes_xywh))
        tb = xywh_to_cxcywh(jnp.asarray(tgt_boxes_xywh))
        cost_dist = cosine_cost(jnp.asarray(out_dists), jnp.asarray(tgt_dists))
        cost_feat = cosine_cost(jnp.asarray(out_feats), jnp.asarray(tgt_feats))
        cost_bbox = jnp.abs(ob[:, None] - tb[None]).sum(-1)
        cost_giou = -generalized_iou(cxcywh_to_xyxy(ob), cxcywh_to_xyxy(tb))
        return (self.cost_class * cost_dist + self.cost_feature * cost_feat
                + self.cost_bbox * cost_bbox + self.cost_giou * cost_giou)

    def __call__(self, outputs: dict, targets: dict):
        """Reference forward: returns (row_ind, col_ind, dist_costs, feat_costs)."""
        C = self.cost_matrix(outputs["boxes"], outputs["features"], outputs["dists"],
                             targets["boxes"], targets["features"], targets["dists"])
        cost_dist = cosine_cost(jnp.asarray(outputs["dists"]), jnp.asarray(targets["dists"]))
        cost_feat = cosine_cost(jnp.asarray(outputs["features"]), jnp.asarray(targets["features"]))
        row, col = solve_lsap_host(np.asarray(C))
        return row, col, np.asarray(cost_dist)[row, col], np.asarray(cost_feat)[row, col]


def solve_lsap_host(cost: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Exact LSAP via scipy (the reference's solver, lib/matcher.py:149)."""
    from scipy.optimize import linear_sum_assignment
    return linear_sum_assignment(np.asarray(cost))


def solve_lsap_auction(cost: jnp.ndarray, n_iter: int = 200,
                       eps: float | None = None) -> jnp.ndarray:
    """Jittable LSAP: forward auction on a square cost matrix.

    Returns col assignment per row (int32, -1 if unassigned after n_iter —
    does not happen for n_iter >= ~rows/eps on bounded costs). Minimizes cost
    by bidding on benefits = -cost.
    """
    n, m = cost.shape
    assert n <= m, "auction solver expects rows <= cols"
    benefit = -cost
    eps = eps if eps is not None else 1.0 / (n + 1)

    def body(state, _):
        prices, owner, assign = state  # owner: (m,) row owning col, -1 free
        unassigned = assign == -1
        values = benefit - prices[None, :]
        best_j = jnp.argmax(values, axis=1)
        best_v = jnp.max(values, axis=1)
        masked = jnp.where(jax.nn.one_hot(best_j, m, dtype=bool), -jnp.inf, values)
        second_v = jnp.max(masked, axis=1)
        bid = best_v - second_v + eps
        # highest-bidding unassigned row per column wins
        bid_amt = jnp.where(unassigned, bid, -jnp.inf)
        col_bid = jnp.full((m,), -jnp.inf).at[best_j].max(bid_amt)
        winner = jnp.full((m,), -1, jnp.int32)
        # winner[j] = argmax over rows bidding on j
        row_scores = jnp.where(unassigned[:, None]
                               & jax.nn.one_hot(best_j, m, dtype=bool),
                               bid[:, None], -jnp.inf)
        has_bid = jnp.any(jnp.isfinite(row_scores), axis=0)
        winner = jnp.where(has_bid, jnp.argmax(row_scores, axis=0), -1)
        new_prices = jnp.where(has_bid, prices + jnp.maximum(col_bid, 0.0), prices)
        # evict previous owners of re-auctioned columns
        evicted = jnp.where(has_bid, owner, -1)
        assign = jnp.where(jnp.isin(jnp.arange(n), evicted), -1, assign)
        owner = jnp.where(has_bid, winner, owner)
        assign = assign.at[jnp.where(winner >= 0, winner, n)].set(
            jnp.where(has_bid, jnp.arange(m, dtype=jnp.int32), -1),
            mode="drop")
        return (new_prices, owner, assign), None

    init = (jnp.zeros(m), jnp.full((m,), -1, jnp.int32), jnp.full((n,), -1, jnp.int32))
    (prices, owner, assign), _ = jax.lax.scan(body, init, None, length=n_iter)
    return assign

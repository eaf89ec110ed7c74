"""Training losses for the relation models, fully masked and jit-compilable.

Reproduces the label construction + loss math of the reference training loop
(tools/train_STTran.py:148-186, identically tools/train_DSG_DETR.py:141-179):

  * object_loss          — CrossEntropy(pred 37-way logits, grounded labels)
  * attention_relation_loss — CrossEntropy over rels with >=1 attention GT id;
    when a rel has >=2 ids one is sampled uniformly (np.random.choice in the
    reference, a Gumbel/categorical draw here).
  * spatial/contact_relation_loss — BCE (shipped config `bce_loss: True`) over
    rels with >=1 positive, or MultiLabelMarginLoss otherwise.

The reference drops loss terms whose row-mask is empty (`if mask.sum() > 0`)
— a data-dependent branch. Here every term is computed as a masked mean that
is exactly 0 when no row qualifies, which is the same total-loss value and
gradient (terms with empty masks contribute nothing either way).

Padding rows (Entry.box_mask / rel_mask False) never contribute: the
reference has no padding, so masking restores its semantics exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..data.entry import Entry

NEG_INF = -1e30


def _masked_mean(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of `values` over rows where mask is True; 0 if none are."""
    m = mask.astype(values.dtype)
    return (values * m).sum() / jnp.maximum(m.sum(), 1.0)


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Per-row CE with integer labels (torch nn.CrossEntropyLoss, no reduce)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Per-element binary cross entropy from logits (== torch BCELoss on
    sigmoid(logits), numerically stable form)."""
    return jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def multilabel_margin(logits: jnp.ndarray, multi_hot: jnp.ndarray) -> jnp.ndarray:
    """torch nn.MultiLabelMarginLoss per row from a multi-hot target.

    loss(x, y) = sum_{j in pos, i in neg} max(0, 1 - (x[y_j] - x[i])) / C
    (the reference feeds index-list labels, tools/train_STTran.py:162-167;
    a multi-hot carries identical information).
    """
    C = logits.shape[-1]
    pos = multi_hot > 0
    # pairwise margins m[j, i] = 1 - (x_j - x_i), counted when j pos and i neg
    diff = 1.0 - (logits[..., :, None] - logits[..., None, :])
    pair = pos[..., :, None] & ~pos[..., None, :]
    return jnp.where(pair, jnp.maximum(diff, 0.0), 0.0).sum(axis=(-2, -1)) / C


def sample_multi_hot(rng: jax.Array, multi_hot: jnp.ndarray) -> jnp.ndarray:
    """Uniform draw among set bits of each row (rows with none -> 0)."""
    logits = jnp.where(multi_hot > 0, 0.0, NEG_INF)
    return jax.random.categorical(rng, logits, axis=-1)


def sttran_losses(pred: dict[str, jnp.ndarray], entry: Entry, rng: jax.Array,
                  bce: bool = True) -> dict[str, jnp.ndarray]:
    """All loss terms + 'total'. `pred` is STTran/DSGDETR output (logits)."""
    losses: dict[str, jnp.ndarray] = {}

    obj_ce = cross_entropy(pred["distribution"], entry.labels)
    losses["object_loss"] = _masked_mean(obj_ce, entry.box_mask)

    att_rows = entry.rel_mask & (entry.attention_gt.sum(-1) > 0)
    att_label = sample_multi_hot(rng, entry.attention_gt)
    att_ce = cross_entropy(pred["attention_distribution"], att_label)
    losses["attention_relation_loss"] = _masked_mean(att_ce, att_rows)

    if bce:
        sp_rows = entry.rel_mask & (entry.spatial_gt.sum(-1) > 0)
        con_rows = entry.rel_mask & (entry.contacting_gt.sum(-1) > 0)
        sp = bce_with_logits(pred["spatial_logits"], entry.spatial_gt).mean(-1)
        con = bce_with_logits(pred["contacting_logits"], entry.contacting_gt).mean(-1)
    else:
        # margin mode masks by `(index_labels > 0).sum() != 0`
        # (tools/train_STTran.py:171-172): a row whose ONLY GT id is
        # predicate 0 is EXCLUDED from MultiLabelMarginLoss (its -1-padded
        # label row [0, -1, ...] has no positive entry) — unlike BCE mode,
        # where the multi-hot bit 0 keeps the row
        sp_rows = entry.rel_mask & (entry.spatial_gt[..., 1:].sum(-1) > 0)
        con_rows = entry.rel_mask & (entry.contacting_gt[..., 1:].sum(-1) > 0)
        sp = multilabel_margin(pred["spatial_logits"], entry.spatial_gt)
        con = multilabel_margin(pred["contacting_logits"], entry.contacting_gt)
    losses["spatial_relation_loss"] = _masked_mean(sp, sp_rows)
    losses["contact_relation_loss"] = _masked_mean(con, con_rows)

    losses["total"] = (losses["object_loss"] + losses["attention_relation_loss"]
                       + losses["spatial_relation_loss"] + losses["contact_relation_loss"])
    return losses

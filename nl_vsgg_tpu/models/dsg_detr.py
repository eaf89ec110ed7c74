"""DSG-DETR relation model, TPU-native.

Re-implements lib/dsg_detr.py (whose top class is also named `STTran`,
:464-571) as a jit-compilable flax module over the padded Entry pytree.

Key redesign (math preserved, shapes static):

  * The reference python-loops over `unique()` frame / object-class groups,
    pad_sequences them, and runs torch TransformerEncoders per group
    (:536-564). Here every grouping is an allow-mask over the flat relation
    array: spatial attention allows same-frame pairs, temporal attention
    allows same-object-class pairs. Identical attention sets, one kernel.
  * The temporal positional encoding indexes a sinusoidal table by the
    relation's *rank within its tracklet* — the reference computes ranks via
    `torch.unique(pair_idx[index][:, 0], return_counts=True)` (:551-555),
    i.e. the rank of the relation's subject (person) box among the distinct
    subject boxes of its class sequence. Rebuilt closed-form: rank[i] =
    #{distinct subject rows j of the same class with row < row_i}.
  * Single-element sequences need no special "save memory" pooling
    (lib/track.py:140-151): under masking a singleton attends to itself with
    rank 0 — exactly what the reference's length-1 encoder call computes.

The object classifier's weak-supervision branch (:277-288) is the same GloVe
soft-embed + BatchNorm pos-embed + 2376->1024->37 decoder as STTran's, and is
shared (ObjectClassifierWK). The tracklet-sequence object encoder used by the
non-wks sgcls/predcls paths (:296-344) is ObjectClassifierTracklet below,
driven by a per-box group-id vector from models/track.py.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..data.entry import Entry
from .layers import TorchEncoderLayer, sinusoidal_position_table
from .sttran import (ObjectClassifierWK, SpatialMaskConv, _const_init,
                     spatial_mask_input, union_projection)


def sequence_ordinal(group_id: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """ordinal[i] = position of row i within its group, ordered by flat index
    — the reference's pad_sequence layout with pos_index=None
    (lib/dsg_detr.py:556-560 for sgcls/predcls: PositionalEncoding adds
    pe[0..len-1] per sequence token)."""
    R = group_id.shape[-1]
    same = (group_id[..., :, None] == group_id[..., None, :]) \
        & valid[..., :, None] & valid[..., None, :]
    lower = jnp.tril(jnp.ones((R, R), bool), -1)
    return (same & lower).sum(-1).astype(jnp.int32)


def tracklet_rank(group_id: jnp.ndarray, anchor: jnp.ndarray,
                  valid: jnp.ndarray) -> jnp.ndarray:
    """rank[i] = number of distinct `anchor` values < anchor[i] within
    group_id[i]'s group (lib/dsg_detr.py:551-555's unique/counts loop)."""
    same = (group_id[..., :, None] == group_id[..., None, :]) \
        & valid[..., :, None] & valid[..., None, :]
    same_anchor = same & (anchor[..., :, None] == anchor[..., None, :])
    # mult[j] = how many group members share j's anchor value
    mult = same_anchor.sum(-1).astype(jnp.float32)
    # each j with anchor[j] < anchor[i] contributes 1/mult[j] -> counts
    # distinct smaller anchor values exactly once
    less = anchor[..., None, :] < anchor[..., :, None]
    contrib = jnp.where(same & less, 1.0 / jnp.maximum(mult[..., None, :], 1.0), 0.0)
    return jnp.round(contrib.sum(-1)).astype(jnp.int32)


class SinusoidalPE(nn.Module):
    """PositionalEncoding (lib/dsg_detr.py:26-48): fixed sin/cos table +
    dropout, indexed by explicit positions."""

    d_model: int
    max_len: int = 400
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, positions: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        table = sinusoidal_position_table(self.max_len, self.d_model)
        x = x + table[jnp.clip(positions, 0, self.max_len - 1)]
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class ObjectClassifierTracklet(nn.Module):
    """Non-wks object head (lib/dsg_detr.py:296-344): 3-layer encoder over
    object tracklet sequences (group ids from models/track.py), sinusoidal
    positions = rank of the box's frame within its tracklet."""

    num_classes: int = 37
    embed_init: Any = nn.initializers.normal(1.0)
    mode: str = "sgcls"

    @nn.compact
    def __call__(self, entry: Entry, group_id: jnp.ndarray,
                 train: bool = False) -> tuple[jnp.ndarray, jnp.ndarray]:
        from .layers import MaskedBatchNorm
        from ..ops.boxes import center_size
        det = not train
        embed_w = self.param("obj_embed", self.embed_init, (self.num_classes - 1, 200))
        obj_embed = entry.distribution @ embed_w
        pos = MaskedBatchNorm(momentum=0.01 / 10.0, name="pos_bn")(
            center_size(entry.boxes), entry.box_mask, use_running_average=det)
        pos = nn.Dense(128, name="pos_fc")(pos)
        pos = nn.Dropout(0.1)(nn.relu(pos), deterministic=det)
        obj_features = jnp.concatenate([entry.features, obj_embed, pos], axis=-1)
        d_model = obj_features.shape[-1]

        allow = (group_id[..., :, None] == group_id[..., None, :]) \
            & entry.box_mask[..., :, None] & entry.box_mask[..., None, :]
        ranks = tracklet_rank(group_id, entry.box_frame, entry.box_mask)
        h = SinusoidalPE(d_model, max_len=600 if self.mode == "sgdet" else 400,
                         name="positional_encoder")(obj_features, ranks, det)
        for i in range(3):
            h = TorchEncoderLayer(d_model, 8, 1024, name=f"enc_{i}")(h, allow, det)
        h = jnp.where(entry.box_mask[..., None], h, 0.0)

        z = nn.Dense(1024, name="decoder_fc1")(h)
        z = MaskedBatchNorm(name="decoder_bn")(z, entry.box_mask,
                                               use_running_average=det)
        logits = nn.Dense(self.num_classes, name="decoder_fc2")(nn.relu(z))
        return jnp.where(entry.box_mask[..., None], logits, 0.0), h


class DSGDETR(nn.Module):
    """lib/dsg_detr.py:464-571 over a padded Entry. Output dict matches
    STTran's (attention/spatial/contacting distributions + logits)."""

    mode: str = "sgdet"
    attention_class_num: int = 3
    spatial_class_num: int = 6
    contact_class_num: int = 17
    obj_classes: Sequence[str] = ()
    feat_dim: int = 2048
    enc_layer_num: int = 1   # spatial (local) encoder layers (:506)
    dec_layer_num: int = 3   # temporal (global) encoder layers (:503)
    dtype: Any = None        # compute dtype; params stay fp32
    remat: bool = False      # jax.checkpoint every encoder layer (cfg.remat)
    fused: bool = False      # Pallas fused masked attention (cfg.fused_attention)
    glove_obj36: np.ndarray | None = None  # (36, 200) classifier soft-embed
    glove_obj37: np.ndarray | None = None  # (37, 200) semantic tables

    @nn.compact
    def __call__(self, entry: Entry, train: bool = False,
                 group_id: jnp.ndarray | None = None) -> dict[str, jnp.ndarray]:
        """`group_id` (N,) assigns each box to a tracklet for the non-wks
        predcls/sgcls object encoder (models/track.py get_sequence/tracker);
        for predcls it defaults to grouping by GT label (lib/track.py:128-133).
        The shipped weak-supervision sgdet path ignores it."""
        det = not train
        init36 = (_const_init(self.glove_obj36) if self.glove_obj36 is not None
                  else nn.initializers.normal(1.0))
        num_classes = max(len(self.obj_classes), 37)

        out: dict[str, jnp.ndarray] = {}
        if self.mode == "predcls":
            pred_labels = entry.labels
        elif self.mode == "sgcls":
            gid = group_id if group_id is not None else entry.labels
            obj_logits, _ = ObjectClassifierTracklet(
                num_classes, init36, mode=self.mode,
                name="object_classifier")(entry, gid, train)
            out["distribution"] = obj_logits
            pred_labels = entry.labels  # train labels (:321); sgcls_infer
            # reassigns at eval. NOTE: the reference also overwrites
            # entry["features"] with the 2376-d encoder output (:319), which
            # would crash its own 2048-in subj_fc — dead code behind the
            # hardcoded is_wks=True (:89); we keep the RoI features.
        else:
            obj_logits = ObjectClassifierWK(num_classes, init36,
                                            name="object_classifier")(entry, train)
            out["distribution"] = obj_logits
            pred_labels = entry.labels
        out["pred_labels"] = pred_labels
        out["pred_scores"] = entry.scores

        # ---- visual + semantic fusion (:517-532), identical to STTran ----
        subj_rep = nn.Dense(512, name="subj_fc", dtype=self.dtype)(
            entry.features[..., entry.pair_idx[..., 0], :])
        obj_rep = nn.Dense(512, name="obj_fc", dtype=self.dtype)(
            entry.features[..., entry.pair_idx[..., 1], :])
        union_proj = union_projection(entry.union_feat, self.feat_dim, self.dtype)
        mask_feat = SpatialMaskConv(dtype=self.dtype, name="spatial_conv")(
            spatial_mask_input(entry), entry.rel_mask, train)
        vr = union_proj + mask_feat
        vr = nn.Dense(512, name="vr_fc", dtype=self.dtype)(vr.reshape(*vr.shape[:-3], -1))
        x_visual = jnp.concatenate([subj_rep, obj_rep, vr], axis=-1)

        # The reference declares Embedding(len-1) rows (:495-499) but then
        # overwrites .weight.data with the 37-row GloVe table (torch .data
        # assignment skips shape checks) — the live table has 37 rows.
        init37 = (_const_init(self.glove_obj37) if self.glove_obj37 is not None
                  else nn.initializers.normal(1.0))
        embed1 = self.param("obj_embed", init37, (num_classes, 200))
        embed2 = self.param("obj_embed2", init37, (num_classes, 200))
        subj_cls = pred_labels[..., entry.pair_idx[..., 0]]
        obj_cls = pred_labels[..., entry.pair_idx[..., 1]]
        x_semantic = jnp.concatenate([embed1[subj_cls], embed2[obj_cls]], axis=-1)
        rel_features = jnp.concatenate([x_visual, x_semantic], axis=-1)  # (R, 1936)
        d_model = rel_features.shape[-1]

        rmask = entry.rel_mask
        # ---- spatial: same-frame attention (:536-543) ----
        frame_of = entry.box_frame[..., entry.pair_idx[..., 1]]
        allow_s = (frame_of[..., :, None] == frame_of[..., None, :]) \
            & rmask[..., :, None] & rmask[..., None, :]
        # self counts as argument 0 in flax lifted-transform static_argnums
        Enc = (nn.remat(TorchEncoderLayer, static_argnums=(3,))
               if self.remat else TorchEncoderLayer)
        h = rel_features
        for i in range(self.enc_layer_num):
            h = Enc(d_model, 8, 2048, dtype=self.dtype, fused=self.fused,
                    name=f"local_{i}")(h, allow_s, det)
        h = jnp.where(rmask[..., None], h, 0.0)

        # ---- temporal: same-object-class tracklets (:545-564) ----
        allow_t = (obj_cls[..., :, None] == obj_cls[..., None, :]) \
            & rmask[..., :, None] & rmask[..., None, :]
        if self.mode == "sgdet":
            sub_row = entry.pair_idx[..., 0]
            ranks = tracklet_rank(obj_cls, sub_row, rmask)
        else:
            # sgcls/predcls pass pos_index=None (:559): the PE position is
            # the relation's ORDINAL within its class sequence (flat-index
            # order), not the unique-subject rank — duplicate non-modal
            # classes in one frame get consecutive positions
            ranks = sequence_ordinal(obj_cls, rmask)
        # taps for the sequence-parallel parity test (parallel/dsg_detr_sp.py):
        # no-ops unless apply() makes "intermediates" mutable
        self.sow("intermediates", "rel_features", rel_features)
        self.sow("intermediates", "frame_of", frame_of)
        self.sow("intermediates", "obj_cls", obj_cls)
        self.sow("intermediates", "ranks", ranks)
        g = SinusoidalPE(d_model, max_len=400, name="positional_encoder")(h, ranks, det)
        for i in range(self.dec_layer_num):
            g = Enc(d_model, 8, 2048, dtype=self.dtype, fused=self.fused,
                    name=f"global_{i}")(g, allow_t, det)
        global_output = jnp.where(rmask[..., None], g, 0.0).astype(jnp.float32)

        out["global_output"] = global_output
        out["attention_distribution"] = nn.Dense(
            self.attention_class_num, name="a_rel_compress")(global_output)
        s_logits = nn.Dense(self.spatial_class_num, name="s_rel_compress")(global_output)
        c_logits = nn.Dense(self.contact_class_num, name="c_rel_compress")(global_output)
        out["spatial_logits"] = s_logits
        out["contacting_logits"] = c_logits
        out["spatial_distribution"] = nn.sigmoid(s_logits)
        out["contacting_distribution"] = nn.sigmoid(c_logits)
        return out

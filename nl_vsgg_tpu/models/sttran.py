"""STTran relation model, TPU-native.

Re-implements the semantics of lib/sttran.py (ObjectClassifier + STTran) and
lib/transformer_wk.py (transformer_wk, the shipped `wk` variant) as one
jit-compilable flax module over a padded Entry pytree.

Key redesign vs the reference (math preserved, shapes made static):

  * transformer_wk materializes per-frame [l, b, 1936] grids and python-loops
    over b-1 sliding windows of 2 frames (lib/transformer_wk.py:130-217).
    Each relation participates in at most two windows — once as a "former"
    (window = its own frame) and once as a "latter" (window = previous frame)
    token, and the windows are *independent* 3-layer decoder runs. We
    therefore duplicate the R relation tokens into 2R (former ++ latter)
    streams, attach each token its window id and slot id, and run the decoder
    once with the allow-mask `window[q] == window[k]`. This is *exact*: a
    token's attention set is precisely the relations of its window's two
    frames, with the 2-slot learned frame embedding added to q/k per layer.
    The output per relation is its latter-stream row (former for frame 0),
    matching 'latter' fusion (lib/transformer_wk.py:209-215); 'both' averages
    the two streams (lib/transformer_wk.py:197-207).
  * Empty-frame dropping (retain_line, lib/transformer_wk.py:145-150) is
    subsumed by masking: empty frames contribute no valid tokens.
  * Single-frame videos skip the temporal decoder and return the spatial
    encoder output (lib/transformer_wk.py:187-188) — here a `where` on
    num_frames.
  * The 27x27 spatial-mask conv stack and 1x1 union-feature conv run in NHWC;
    the flattening order into vr_fc is therefore (H, W, C) instead of torch's
    (C, H, W) — a fixed permutation for weight converters.

Object classifier (weak-supervision branch, lib/sttran.py:173-184): GloVe
soft-embedding of the detector distribution, BatchNorm'd box position embed,
2376 -> 1024 -> 37 decoder. BatchNorm runs masked so padding never leaks into
statistics.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..data.entry import MASK_P, Entry
from ..ops.boxes import center_size
from ..ops.union_masks import draw_union_boxes
from .layers import MaskedBatchNorm, MaskedDecoderLayer, MaskedEncoderLayer


def _const_init(value: np.ndarray):
    return lambda key, shape, dtype=jnp.float32: jnp.asarray(value, dtype)


def union_projection(union_feat: jnp.ndarray, feat_dim: int, dtype) -> jnp.ndarray:
    """union_func1: the reference's 1x1 conv over union features
    (lib/sttran.py:336) as a channel-axis Dense — the dot form keeps the big
    (R, 7, 7, C) operand in its natural layout (the conv form forced a full
    layout copy; tools/probe_trace.py).

    A width-0 `union_feat` (zero-union mode: the Entry was built with no
    union-feature provider, so the logical input is all-zeros) is the exact
    fast path: xW+b == b. We feed a CONSTANT zeros of the full width — XLA
    constant-folds dot(0, W) to 0 in both the forward and the kernel-grad
    (verified: 0 HLO flops), leaving only the bias broadcast, and the
    (feat_dim, 256) param tree is identical to the dense path so checkpoints
    interchange. Saves ~0.5 TFLOP of a 2.33 TFLOP batch-64 inference call
    plus the 38 MB/video of device zeros.

    Must be called from inside a compact module; the Dense attaches to the
    caller's scope as 'union_func1'."""
    if union_feat.shape[-1] == 0:
        union_feat = jnp.zeros(union_feat.shape[:-1] + (feat_dim,),
                               union_feat.dtype)
    return nn.Dense(256, name="union_func1", dtype=dtype)(union_feat)


def spatial_mask_input(entry: Entry) -> jnp.ndarray:
    """The (R, 27, 27, 2) spatial-mask conv input.

    A width-0 `entry.spatial_masks` is the device-compute sentinel: the
    masks are an exact closed-form function of the pair boxes
    (ops/union_masks.draw_union_boxes, the XLA twin of the host
    draw_union_boxes_np used at lib/assign_pseudo_label.py:1359-1363), so
    they are rasterized here from `boxes[pair_idx]` instead of being built
    on the host and uploaded (~560 KB/video fp32). Padded relations index
    boxes[0] and produce junk rows — every consumer masks by rel_mask.
    """
    if entry.spatial_masks.shape[-1]:
        return entry.spatial_masks
    sub = entry.boxes[..., entry.pair_idx[..., 0], :]
    obj = entry.boxes[..., entry.pair_idx[..., 1], :]
    pair_rois = jnp.concatenate([sub, obj], axis=-1)
    return draw_union_boxes(pair_rois, MASK_P) - 0.5


class ObjectClassifierWK(nn.Module):
    """Weak-supervision object head (lib/sttran.py:20-51, 173-184)."""

    num_classes: int = 37
    embed_init: Any = nn.initializers.normal(1.0)

    @nn.compact
    def __call__(self, entry: Entry, train: bool = False) -> jnp.ndarray:
        # (N, 36) distribution @ (36, 200) GloVe table
        embed_w = self.param("obj_embed", self.embed_init, (self.num_classes - 1, 200))
        obj_embed = entry.distribution @ embed_w
        pos = MaskedBatchNorm(momentum=0.01 / 10.0, name="pos_bn")(
            center_size(entry.boxes), entry.box_mask, use_running_average=not train)
        pos = nn.Dense(128, name="pos_fc")(pos)
        pos = nn.Dropout(0.1)(nn.relu(pos), deterministic=not train)
        obj_features = jnp.concatenate([entry.features, obj_embed, pos], axis=-1)
        h = nn.Dense(1024, name="decoder_fc1")(obj_features)
        h = MaskedBatchNorm(name="decoder_bn")(h, entry.box_mask,
                                               use_running_average=not train)
        logits = nn.Dense(self.num_classes, name="decoder_fc2")(nn.relu(h))
        return jnp.where(entry.box_mask[..., None], logits, 0.0)


class SpatialMaskConv(nn.Module):
    """2 -> 256 conv tower over 27x27 masks (lib/sttran.py:337-345), NHWC.

    `dtype` is the conv compute dtype; BatchNorm statistics stay fp32
    (MaskedBatchNorm upcasts via its fp32 running buffers)."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(128, (7, 7), strides=2, padding=((3, 3), (3, 3)),
                    dtype=self.dtype, name="conv1")(x)
        x = nn.relu(x)
        x = MaskedBatchNorm(momentum=0.01, name="bn1")(x, mask, use_running_average=not train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        x = nn.Conv(256, (3, 3), strides=1, padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv2")(x)
        x = nn.relu(x)
        x = MaskedBatchNorm(momentum=0.01, name="bn2")(x, mask, use_running_average=not train)
        return x


class STTranTransformer(nn.Module):
    """Spatial encoder + windowed temporal decoder (lib/transformer_wk.py)."""

    embed_dim: int = 1936
    num_heads: int = 8
    dim_feedforward: int = 2048
    dropout: float = 0.1
    enc_layers: int = 1
    dec_layers: int = 3
    mode: str = "latter"  # 'latter' | 'both'
    variant: str = "wk"  # 'wk' (lib/transformer_wk.py, shipped) | 'org'
    # (lib/transformer.py::transformer). On every input org can process
    # (each frame 0..b-1 populated) the two are the same function; they
    # differ ONLY on window-less videos (all relations in frame 0), where
    # org leaves its zeros-initialized output untouched
    # (lib/transformer.py:165,185-189) while wk passes the spatial encoder
    # output through. Empty mid-video frames are outside org's domain (its
    # fully-masked attention rows are NaN in the reference).
    dtype: Any = None  # compute dtype (bfloat16 on TPU); params stay fp32
    remat: bool = False  # rematerialize encoder/decoder layers in the bwd
    # pass (jax.checkpoint): ~layer-depth x less activation memory for the
    # temporal stack at the cost of recomputing the fwd — same math
    fused: bool = False  # Pallas fused masked attention (ops/pallas_attention)

    @nn.compact
    def __call__(self, rel_features: jnp.ndarray, im_idx: jnp.ndarray,
                 rel_mask: jnp.ndarray, num_frames: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        det = not train
        R = rel_features.shape[-2]
        # self counts as argument 0 in flax lifted-transform static_argnums
        Enc = (nn.remat(MaskedEncoderLayer, static_argnums=(3,))
               if self.remat else MaskedEncoderLayer)
        # static args (self=0): deterministic=4, dup2=7; remat-wrapped layers
        # are therefore always called with the full positional signature
        Dec = (nn.remat(MaskedDecoderLayer, static_argnums=(4, 7))
               if self.remat else MaskedDecoderLayer)

        # ---- spatial encoder: attention within the same frame ----
        same_frame = im_idx[..., :, None] == im_idx[..., None, :]
        allow_s = same_frame & rel_mask[..., :, None] & rel_mask[..., None, :]
        local = rel_features
        for i in range(self.enc_layers):
            local = Enc(self.embed_dim, self.num_heads,
                        self.dim_feedforward, self.dropout,
                        dtype=self.dtype, fused=self.fused,
                        name=f"enc_{i}")(local, allow_s, det)
        local = jnp.where(rel_mask[..., None], local, 0.0)

        # ---- temporal decoder over duplicated former/latter streams ----
        cat = partial(jnp.concatenate, axis=-1)
        window = cat([im_idx, im_idx - 1])                      # (2R,)
        slot = cat([jnp.zeros_like(im_idx), jnp.ones_like(im_idx)])
        # b = LAST RELATION-BEARING frame + 1, not the video's frame count:
        # the reference sizes its window grid by `b = int(im_idx[-1] + 1)`
        # (lib/transformer_wk.py:135), so trailing relation-less frames
        # contribute no windows — a video whose relations all sit in frame 0
        # has ZERO windows and passes the spatial output through even when
        # the video itself has many frames
        f_last = jnp.max(jnp.where(rel_mask, im_idx, 0))
        last_window = f_last - 1  # windows are 0 .. b-2
        valid = cat([rel_mask & (im_idx <= last_window),         # former
                     rel_mask & (im_idx >= 1)])                  # latter
        allow_t = (window[..., :, None] == window[..., None, :]) \
            & valid[..., :, None] & valid[..., None, :]

        pe = self.param("position_embedding", nn.initializers.uniform(scale=1.0),
                        (2, self.embed_dim))
        pos = pe[slot]
        # the last ('latter') layer is rectangular and called with kv=/
        # pos_kv= keywords, which lifted remat's static_argnums indexing
        # does not cover — it stays unremated (1 of dec_layers layers)
        dec = [(Dec if i < self.dec_layers - 1 or self.mode == "both"
                else MaskedDecoderLayer)(
                    self.embed_dim, self.num_heads, self.dim_feedforward,
                    self.dropout, dtype=self.dtype, fused=self.fused,
                    name=f"dec_{i}")
               for i in range(self.dec_layers)]

        def run_square(layers):
            # The 2R former/latter stream rows entering layer 0 are identical
            # copies of `local` (only their slot embedding differs), so the
            # first layer runs the dup2 fast path: q/k/v projections on R rows
            # + the 2-row slot-embedding projection, exact same outputs
            # (MaskedDecoderLayer.dup2). Later layers see diverged streams.
            toks = jnp.concatenate([local, local], axis=-2)      # (2R, D)
            for i, layer in enumerate(layers):
                if i == 0:
                    toks = layer(local, pe, allow_t, det, None, None, True)
                else:
                    toks = layer(toks, pos, allow_t, det, None, None, False)
            return toks

        if self.mode == "both":
            tokens = run_square(dec)
            former, latter = tokens[..., :R, :], tokens[..., R:, :]
            mid = 0.5 * (former + latter)
            out = jnp.where((im_idx == 0)[..., None], former,
                            jnp.where((im_idx == f_last)[..., None], latter, mid))
        else:  # 'latter' (shipped config, lib/sttran.py:358)
            # Only R of the 2R stream rows ever reach the output: the latter
            # row of each relation, except frame 0 which uses its former row.
            # All 2R rows are needed as K/V context through the second-to-last
            # layer, but the LAST layer's query/FFN work is computed for just
            # those R output rows (identical per-row math; ~1/6 of decoder
            # FLOPs saved at dec_layers=3).
            tokens = run_square(dec[:-1])
            is0 = im_idx == 0
            q_tokens = jnp.where(is0[..., None], tokens[..., :R, :],
                                 tokens[..., R:, :])
            q_window = jnp.where(is0, im_idx, im_idx - 1)
            q_slot = jnp.where(is0, 0, 1)
            q_valid = jnp.where(is0, rel_mask & (im_idx <= last_window),
                                rel_mask & (im_idx >= 1))
            allow_q = (q_window[..., :, None] == window[..., None, :]) \
                & q_valid[..., :, None] & valid[..., None, :]
            out = dec[-1](q_tokens, pe[q_slot], allow_q, det,
                          kv=tokens, pos_kv=pos)
        # no windows exist (all relations in frame 0, incl. single-frame
        # videos) -> wk passes the spatial output through
        # (lib/transformer_wk.py:187); org returns zeros (its output buffer
        # is zeros-initialized and the window loops never run,
        # lib/transformer.py:165,185-189)
        fallback = local if self.variant == "wk" else jnp.zeros_like(local)
        out = jnp.where(f_last > 0, out, fallback)
        return jnp.where(rel_mask[..., None], out, 0.0)


class STTran(nn.Module):
    """Full STTran (lib/sttran.py:314-411) over a padded Entry.

    Returns a dict: object `distribution` logits, `attention_distribution`
    logits, sigmoided `spatial_distribution` / `contacting_distribution`
    (+ raw logits for stable losses), and `global_output` rel embeddings.
    """

    mode: str = "sgdet"
    attention_class_num: int = 3
    spatial_class_num: int = 6
    contact_class_num: int = 17
    obj_classes: Sequence[str] = ()
    enc_layer_num: int = 1
    dec_layer_num: int = 3
    feat_dim: int = 2048
    transformer_fusion: str = "latter"
    transformer_variant: str = "wk"  # 'wk' | 'org' (see STTranTransformer)
    dtype: Any = None  # compute dtype; None = float32
    remat: bool = False  # checkpoint the temporal stack (see STTranTransformer)
    fused: bool = False  # Pallas fused masked attention (ops/pallas_attention)
    glove_obj36: np.ndarray | None = None  # (36, 200) for the classifier
    glove_obj37: np.ndarray | None = None  # (37, 200) for semantic embeds

    @nn.compact
    def __call__(self, entry: Entry, train: bool = False) -> dict[str, jnp.ndarray]:
        init36 = (_const_init(self.glove_obj36) if self.glove_obj36 is not None
                  else nn.initializers.normal(1.0))
        init37 = (_const_init(self.glove_obj37) if self.glove_obj37 is not None
                  else nn.initializers.normal(1.0))
        num_classes = max(len(self.obj_classes), 37)

        out: dict[str, jnp.ndarray] = {}
        if self.mode == "predcls":
            pred_labels = entry.labels
            obj_logits = None
        else:  # sgdet weak-supervision branch (and sgcls train) share this head
            obj_logits = ObjectClassifierWK(num_classes, init36,
                                            name="object_classifier")(entry, train)
            pred_labels = entry.labels
            out["distribution"] = obj_logits
        out["pred_labels"] = pred_labels
        out["pred_scores"] = entry.scores

        # ---- visual part (lib/sttran.py:380-388) ----
        subj_rep = nn.Dense(512, name="subj_fc", dtype=self.dtype)(
            entry.features[..., entry.pair_idx[..., 0], :])
        obj_rep = nn.Dense(512, name="obj_fc", dtype=self.dtype)(
            entry.features[..., entry.pair_idx[..., 1], :])
        union_proj = union_projection(entry.union_feat, self.feat_dim, self.dtype)
        mask_feat = SpatialMaskConv(dtype=self.dtype, name="spatial_conv")(
            spatial_mask_input(entry), entry.rel_mask, train)
        vr = union_proj + mask_feat  # (R, 7, 7, 256)
        vr = nn.Dense(512, name="vr_fc", dtype=self.dtype)(vr.reshape(*vr.shape[:-3], -1))
        x_visual = jnp.concatenate([subj_rep, obj_rep, vr], axis=-1)

        # ---- semantic part (lib/sttran.py:350-355, 391-396) ----
        # The reference declares Embedding(len-1) but then overwrites
        # .weight.data with the 37-row GloVe table (torch .data assignment
        # skips shape checks), so the live table has 37 rows.
        embed1 = self.param("obj_embed", init37, (num_classes, 200))
        embed2 = self.param("obj_embed2", init37, (num_classes, 200))
        subj_cls = pred_labels[..., entry.pair_idx[..., 0]]
        obj_cls = pred_labels[..., entry.pair_idx[..., 1]]
        x_semantic = jnp.concatenate([embed1[subj_cls], embed2[obj_cls]], axis=-1)

        rel_features = jnp.concatenate([x_visual, x_semantic], axis=-1)  # (R, 1936)

        global_output = STTranTransformer(
            embed_dim=rel_features.shape[-1], enc_layers=self.enc_layer_num,
            dec_layers=self.dec_layer_num, mode=self.transformer_fusion,
            variant=self.transformer_variant,
            dtype=self.dtype, remat=self.remat, fused=self.fused,
            name="glocal_transformer",
        )(rel_features, entry.im_idx, entry.rel_mask, entry.num_frames, train)
        global_output = global_output.astype(jnp.float32)  # heads in fp32

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

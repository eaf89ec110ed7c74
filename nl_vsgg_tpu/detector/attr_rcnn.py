"""VinVL AttrRCNN detector facade (TPU-native).

The reference delegates detection + RoI feature extraction to the external
scene_graph_benchmark AttrRCNN (CUDA) via `prepare_func`
(lib/assign_pseudo_label.py:973-1000) and the wrappers in
lib/extract_bbox_features.py. This module is that stack rebuilt in flax/XLA:

  * `preprocess` — cv2-BGR image -> resized (min 600 / max 1000), BGR pixel
    means subtracted (vinvl_x152c4.yaml INPUT), padded to a static bucket so
    every video compiles to a handful of shapes.
  * `AttrRCNNJax.detect` — backbone -> RPN -> box head -> padded detections
    with per-box mean-pooled 2048-d features (== dets.npy/feat.npy schema,
    NL-VSGG/data_preprocess/extract_bbox_features_ag.py:108-120).
  * `AttrRCNNJax.extract_box_features` — (N, 7, 7, 2048) RoI features for
    *given* boxes (the reference's extract_feature_given_bbox,
    lib/extract_bbox_features.py:98-160, used for union features).

Layout notes: everything is NHWC. The RPN conv heads emit (H, W, A[*4])
channels, whose row-major flattening matches grid_anchors' (pos, anchor)
order — the same (h, w, a) order maskrcnn reaches via permute_and_flatten.

Weights come from the converted vinvl_vg_x152c4.pth checkpoint
(detector/convert.py); without it the module runs with random weights (shape
and pipeline checks only — detection quality requires the real checkpoint).
"""

from __future__ import annotations

from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .anchors import grid_anchors
from .resnet import ResNeXt152C4
from .roi_box import RoIBoxHead, postprocess_detections
from .rpn import RPNHead, select_proposals

PIXEL_MEAN_BGR = np.array([103.530, 116.280, 123.675], np.float32)
MIN_SIZE, MAX_SIZE = 600, 1000


def compute_scale(h: int, w: int, min_size: int = MIN_SIZE,
                  max_size: int = MAX_SIZE) -> float:
    """maskrcnn Resize.get_size min-side scale for an (h, w) image
    (600/1000 rescale). NB the resized NON-min dimension truncates —
    `int(size * h / w)` (dataloader/transforms.py:102-105) — so pixel-exact
    sizes come from resize_hw, not h*scale; this scalar remains for coarse
    uses (bucket hints)."""
    size = min_size
    mn, mx = min(h, w), max(h, w)
    if mx / mn * size > max_size:
        size = int(round(max_size * mn / mx))
    if mn == size:
        return 1.0
    return size / mn


def resize_hw(h: int, w: int, min_size: int = MIN_SIZE,
              max_size: int = MAX_SIZE) -> tuple[int, int]:
    """maskrcnn Resize.get_size_with_aspect_ratio, EXACT
    (dataloader/transforms.py:83-107): min side -> `size` (itself
    int(round(...)) under the max_size cap), the other dimension TRUNCATES
    (int(size * h / w)); a 500x333 image resizes to 900x600, not 901x600."""
    size = min_size
    mn, mx = min(h, w), max(h, w)
    if mx / mn * size > max_size:
        size = int(round(max_size * mn / mx))
    if (w <= h and w == size) or (h <= w and h == size):
        return h, w
    if w < h:
        return int(size * h / w), size
    return size, int(size * w / h)


def preprocess(image_bgr: np.ndarray, bucket_hw: tuple[int, int] | None = None):
    """BGR uint8 (H, W, 3) -> (padded float32 NHWC, box_scale, (new_h, new_w)).

    `box_scale` is the (4,) per-axis [sx, sy, sx, sy] xyxy multiplier: with
    the truncating resize the two axes' ratios differ slightly, and the
    reference resizes BoxLists with per-axis ratios too
    (dataloader/transforms.py:121-125)."""
    import cv2
    h, w = image_bgr.shape[:2]
    nh, nw = resize_hw(h, w)
    img = cv2.resize(image_bgr, (nw, nh), interpolation=cv2.INTER_LINEAR)
    img = img.astype(np.float32) - PIXEL_MEAN_BGR
    if bucket_hw is None:
        bucket_hw = (int(np.ceil(nh / 32)) * 32, int(np.ceil(nw / 32)) * 32)
    out = np.zeros((bucket_hw[0], bucket_hw[1], 3), np.float32)
    out[:nh, :nw] = img
    box_scale = np.asarray([nw / w, nh / h, nw / w, nh / h], np.float32)
    return out, box_scale, (nh, nw)


def video_bucket_hw(frame_images_bgr: list[np.ndarray]) -> tuple[int, int]:
    """Shared padded bucket for a video: the 32-ceil of the per-frame EXACT
    resized sizes. (Deriving it from compute_scale(max_h, max_w) does not
    upper-bound mixed-aspect frames — a 500x1000 frame resizes wider than a
    800x600 frame's bucket — and overflowed preprocess's slice write.)"""
    sizes = [resize_hw(i.shape[0], i.shape[1]) for i in frame_images_bgr]
    return (int(np.ceil(max(s[0] for s in sizes) / 32)) * 32,
            int(np.ceil(max(s[1] for s in sizes) / 32)) * 32)


class AttrRCNNModule(nn.Module):
    """backbone + rpn head + box head as one flax module (shared params)."""

    groups: int = 32
    compute_dtype: jnp.dtype | None = None  # bf16: C5 stage runs reduced

    def setup(self):
        self.backbone = ResNeXt152C4(self.groups)
        self.rpn_head = RPNHead()
        self.box_head = RoIBoxHead(self.groups, dtype=self.compute_dtype)

    def __call__(self, images: jnp.ndarray, boxes: jnp.ndarray):
        c4 = self.backbone(images)
        self.rpn_head(c4)
        cls, _, _ = self.box_head(c4[0], boxes)
        return cls

    def features(self, images: jnp.ndarray) -> jnp.ndarray:
        return self.backbone(images)

    def rpn(self, c4: jnp.ndarray):
        return self.rpn_head(c4)

    def box(self, c4_single: jnp.ndarray, boxes: jnp.ndarray):
        return self.box_head(c4_single, boxes)

    def c5(self, crops: jnp.ndarray) -> jnp.ndarray:
        """C5 head over already-pooled (N, 14, 14, 1024) crops."""
        return self.box_head.head_apply(crops)


class AttrRCNNJax:
    """Inference facade binding params to jitted pipelines.

    `compute_dtype="bfloat16"` casts the (frozen) weights once at load and
    feeds images in bf16 — measured 1.39x on the ResNeXt backbone, whose
    8-channel grouped convs are memory-bound on TPU. Opt-in: features shift
    by ~1e-2 relative and decoded boxes by a few pixels, so the default
    stays fp32 wherever parity with the reference extraction matters
    (outputs are always returned as fp32 either way).
    """

    def __init__(self, variables: dict, module: AttrRCNNModule | None = None,
                 max_proposals: int = 300, max_dets: int = 100,
                 compute_dtype: str | None = None):
        if compute_dtype in ("bfloat16", jnp.bfloat16):
            variables = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if getattr(x, "dtype", None) == jnp.float32 else x, variables)
            in_dtype = jnp.bfloat16
            if module is None:
                module = AttrRCNNModule(compute_dtype=jnp.bfloat16)
            elif module.compute_dtype is None:
                # a dtype-less module (e.g. from create()) must not silently
                # leave the C5 stage in fp32: rebuild with the same layout
                module = AttrRCNNModule(module.groups, compute_dtype=jnp.bfloat16)
            self.module = module
        else:
            in_dtype = jnp.float32
            self.module = module or AttrRCNNModule()
        self.variables = variables
        self.max_proposals = max_proposals
        self.max_dets = max_dets
        _apply = self.module.apply

        def apply(variables, x, *args, method=None):
            # cast only the image/feature-map tensor; box coordinates and the
            # decode/NMS geometry stay fp32 (bf16 coords would cost ~4 px at
            # x~1000). Inside "box", the RoIAlign runs fp32 and only the C5
            # stage drops to bf16 (RoIBoxHead.dtype).
            if method in ("features", "rpn", "c5"):
                x = x.astype(in_dtype)
            out = _apply(variables, x, *args, method=method)
            return jax.tree.map(lambda a: a.astype(jnp.float32), out)

        def box_feats(variables, images, boxes):
            c4 = apply(variables, images, method="features")
            _, _, feats77 = apply(variables, c4[0], boxes, method="box")
            return feats77

        def detect(variables, images, anchors, im_hw):
            c4 = apply(variables, images, method="features")
            logits, deltas = apply(variables, c4, method="rpn")
            obj = logits[0].reshape(-1)
            dl = deltas[0].reshape(-1, 4)
            proposals, pvalid = select_proposals(
                anchors, obj, dl, im_hw, post_nms_top_n=self.max_proposals)
            cls, bd, feats77 = apply(variables, c4[0], proposals, method="box")
            dets = postprocess_detections(cls, bd, proposals, pvalid, im_hw,
                                          max_dets=self.max_dets)
            feats = feats77.mean(axis=(-3, -2))  # (P, 2048)
            # pack everything into ONE array: a single device->host transfer
            # (each transfer pays full round-trip latency on tunneled chips)
            return jnp.concatenate([
                dets["boxes"],
                dets["scores"][:, None],
                dets["labels"][:, None].astype(jnp.float32),
                dets["box_index"][:, None].astype(jnp.float32),
                dets["valid"][:, None].astype(jnp.float32),
                feats[dets["box_index"]],
            ], axis=1)

        def detect_batch(variables, images, anchors, im_hw):
            """Whole-video pass: one backbone call over all frames, RPN +
            box head vmapped per frame. images (F, H, W, 3) same bucket;
            im_hw (F, 2) per-frame valid extents (frames may differ in
            size inside the shared padded bucket)."""
            c4 = apply(variables, images, method="features")
            logits, deltas = apply(variables, c4, method="rpn")
            if im_hw.ndim == 1:  # legacy single-extent callers
                im_hw = jnp.broadcast_to(im_hw, (images.shape[0], 2))

            def per_frame(c4f, lg, dl, hw_f):
                proposals, pvalid = select_proposals(
                    anchors, lg.reshape(-1), dl.reshape(-1, 4), hw_f,
                    post_nms_top_n=self.max_proposals)
                cls, bd, feats77 = apply(variables, c4f, proposals, method="box")
                dets = postprocess_detections(cls, bd, proposals, pvalid, hw_f,
                                              max_dets=self.max_dets)
                feats = feats77.mean(axis=(-3, -2))
                return jnp.concatenate([
                    dets["boxes"], dets["scores"][:, None],
                    dets["labels"][:, None].astype(jnp.float32),
                    dets["box_index"][:, None].astype(jnp.float32),
                    dets["valid"][:, None].astype(jnp.float32),
                    feats[dets["box_index"]]], axis=1)

            return jax.vmap(per_frame)(c4, logits, deltas, im_hw)

        def box_feats_frames(variables, images, boxes, frame_idx):
            """RoI features for boxes spread across frames: one backbone pass
            over all frames + one frame-indexed RoIAlign + one C5 pass."""
            from ..ops.roi_align_mm import roi_align_mm_frames
            c4 = apply(variables, images, method="features")
            crops = roi_align_mm_frames(c4, boxes, frame_idx,
                                        output_size=(14, 14),
                                        spatial_scale=1.0 / 16)
            return apply(variables, crops, method="c5")

        self._apply = apply  # dtype-aware module.apply (host-callable too)
        self._box_feats = jax.jit(box_feats)
        self._detect = jax.jit(detect)
        self._detect_batch = jax.jit(detect_batch)
        self._box_feats_frames = jax.jit(box_feats_frames)

    @classmethod
    def create(cls, rng=None, groups: int = 32, **kw) -> "AttrRCNNJax":
        module = AttrRCNNModule(groups)
        rng = rng if rng is not None else jax.random.key(0)
        img = jnp.zeros((1, 64, 64, 3), jnp.float32)
        bx = jnp.asarray([[0, 0, 16, 16], [8, 8, 32, 32]], jnp.float32)
        variables = module.init(rng, img, bx)
        return cls(variables=variables, module=module, **kw)

    def extract_box_features(self, image: np.ndarray, boxes_xyxy: np.ndarray,
                             preprocessed: bool = False) -> np.ndarray:
        """-> (N, 7, 7, 2048) RoI features, boxes in original image coords."""
        if preprocessed:
            img, scale = image, np.ones(4, np.float32)
        else:
            img, scale, _ = preprocess(image)
        feats = self._box_feats(self.variables, jnp.asarray(img)[None],
                                jnp.asarray(boxes_xyxy, jnp.float32) * scale)
        return np.asarray(feats)

    def extract_box_features_frames(self, frame_images_bgr: list[np.ndarray],
                                    boxes_xyxy: np.ndarray,
                                    frame_idx: np.ndarray) -> np.ndarray:
        """(R, 7, 7, 2048) RoI features for boxes scattered across frames —
        ONE backbone pass + ONE frame-indexed RoIAlign + ONE C5 pass for the
        whole video (replaces per-frame extraction loops)."""
        hw = video_bucket_hw(frame_images_bgr)
        imgs, scales = [], []
        for img in frame_images_bgr:
            p, sc, _ = preprocess(img, bucket_hw=hw)
            imgs.append(p)
            scales.append(sc)
        scale_per_box = np.asarray(scales, np.float32)[np.asarray(frame_idx)]
        boxes = np.asarray(boxes_xyxy, np.float32) * scale_per_box
        feats = self._box_feats_frames(
            self.variables, jnp.asarray(np.stack(imgs)), jnp.asarray(boxes),
            jnp.asarray(frame_idx, jnp.int32))
        return np.asarray(feats)

    def detect_video(self, frame_images_bgr: list[np.ndarray]) -> list[dict]:
        """Detect over a whole video in ONE device call (all frames batched
        through the backbone, one host transfer for all outputs) — the
        offline extraction path (vs the reference's per-frame batch-4 loop,
        NL-VSGG/data_preprocess/extract_bbox_features_ag.py:78)."""
        hw = video_bucket_hw(frame_images_bgr)
        imgs, scales, sizes = [], [], []
        for img in frame_images_bgr:
            p, sc, (nh, nw) = preprocess(img, bucket_hw=hw)
            imgs.append(p)
            scales.append(sc)
            sizes.append((nh, nw))
        anchors = jnp.asarray(grid_anchors(hw[0] // 16, hw[1] // 16))
        # per-frame clip extents: clipping every frame to the video max let a
        # smaller frame's detections extend into its zero-padded region
        im_hw = jnp.asarray(sizes, jnp.float32)
        packed = np.asarray(self._detect_batch(
            self.variables, jnp.asarray(np.stack(imgs)), anchors, im_hw))
        out = []
        for f in range(len(frame_images_bgr)):
            p = packed[f]
            out.append({
                "boxes": p[:, :4] / scales[f],
                "scores": p[:, 4],
                "labels": p[:, 5].astype(np.int64),
                "box_index": p[:, 6].astype(np.int64),
                "valid": p[:, 7] > 0.5,
                "features": p[:, 8:],
            })
        return out

    def make_union_feature_fn(self, frame_images_bgr: list[np.ndarray],
                              bucket_hw: tuple[int, int] | None = None):
        """Returns union_feat_fn(frame_idx, boxes) for data.grounding.

        Precomputes every frame's C4 map once (the reference reruns the full
        backbone per training step per frame, lib/assign_pseudo_label.py:
        1336-1342 — here it is one batched backbone pass per video) and
        serves RoI crops through the matmul RoIAlign + C5 head.
        """
        imgs, scales = [], []
        hw = bucket_hw if bucket_hw is not None \
            else video_bucket_hw(frame_images_bgr)
        for img in frame_images_bgr:
            p, s, _ = preprocess(img, bucket_hw=hw)
            imgs.append(p)
            scales.append(s)
        # through the dtype-aware wrapper: a bf16 facade runs this per-video
        # backbone precompute in bf16 too (direct module.apply would promote
        # fp32 images against bf16 weights and lose the speedup)
        c4 = self._apply(self.variables, jnp.asarray(np.stack(imgs)),
                         method="features")

        def union_feat_fn(frame_idx: int, boxes_xyxy: np.ndarray) -> np.ndarray:
            boxes = jnp.asarray(boxes_xyxy, jnp.float32) * scales[frame_idx]
            _, _, feats77 = self._apply(self.variables, c4[frame_idx],
                                        boxes, method="box")
            return np.asarray(feats77)

        return union_feat_fn

    def detect(self, image_bgr: np.ndarray) -> dict:
        """-> dict(boxes [original coords], scores, labels, features, valid)."""
        img, scale, (nh, nw) = preprocess(image_bgr)
        fh, fw = img.shape[0] // 16, img.shape[1] // 16
        anchors = jnp.asarray(grid_anchors(fh, fw))
        packed = np.asarray(self._detect(
            self.variables, jnp.asarray(img)[None], anchors,
            jnp.asarray([nh, nw], jnp.float32)))
        return {
            "boxes": packed[:, :4] / scale,
            "scores": packed[:, 4],
            "labels": packed[:, 5].astype(np.int64),
            "box_index": packed[:, 6].astype(np.int64),
            "valid": packed[:, 7] > 0.5,
            "features": packed[:, 8:],
        }

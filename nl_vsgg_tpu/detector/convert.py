"""Convert the VinVL checkpoint (vinvl_vg_x152c4.pth, a maskrcnn_benchmark
AttrRCNN state dict) into AttrRCNNModule flax variables.

Name mapping (maskrcnn_benchmark conventions):

  backbone.body.stem.conv1 / stem.bn1          -> backbone.stem_conv1 / stem_bn1
  backbone.body.layer{1..3}.{i}.conv{1..3}     -> backbone.layer{k}.block{i}.conv{j}
  ... .bn{1..3}, .downsample.0/.1              -> ... .bn{j}, .downsample_conv/_bn
  rpn.head.{conv,cls_logits,bbox_pred}         -> rpn_head.{conv,cls_logits,bbox_pred}
  roi_heads.box.feature_extractor.head.layer4  -> box_head.head.layer4
  roi_heads.box.predictor.{cls_score,bbox_pred}-> box_head.predictor.*

Transforms: conv OIHW -> HWIO; grouped convs likewise (XLA's
feature_group_count uses the same per-group output blocking as torch);
linear (O, I) -> (I, O); FrozenBatchNorm2d (weight, bias, running_mean,
running_var) folds into (scale, bias) with the reference's eps=0 form
`scale = weight * running_var.rsqrt()`.

The attribute head (roi_heads.attribute.*) is not used by any NL-VSGG path
(features + boxes only) and is skipped.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np


def _fold_bn(sd: Mapping[str, np.ndarray], prefix: str, eps: float = 0.0):
    w = np.asarray(sd[prefix + ".weight"], np.float32)
    b = np.asarray(sd[prefix + ".bias"], np.float32)
    mean = np.asarray(sd[prefix + ".running_mean"], np.float32)
    var = np.asarray(sd[prefix + ".running_var"], np.float32)
    scale = w / np.sqrt(var + eps)
    return {"scale": scale, "bias": b - mean * scale}


def _conv(sd, key):
    return {"kernel": np.asarray(sd[key + ".weight"], np.float32).transpose(2, 3, 1, 0)}


def _conv_b(sd, key):
    out = _conv(sd, key)
    out["bias"] = np.asarray(sd[key + ".bias"], np.float32)
    return out


def _lin(sd, key):
    return {"kernel": np.asarray(sd[key + ".weight"], np.float32).T,
            "bias": np.asarray(sd[key + ".bias"], np.float32)}


def _stage(sd, src_prefix: str, n_blocks: int) -> dict:
    out = {}
    for i in range(n_blocks):
        p = f"{src_prefix}.{i}"
        blk = {
            "conv1": _conv(sd, p + ".conv1"), "bn1": _fold_bn(sd, p + ".bn1"),
            "conv2": _conv(sd, p + ".conv2"), "bn2": _fold_bn(sd, p + ".bn2"),
            "conv3": _conv(sd, p + ".conv3"), "bn3": _fold_bn(sd, p + ".bn3"),
        }
        if p + ".downsample.0.weight" in sd:
            blk["downsample_conv"] = _conv(sd, p + ".downsample.0")
            blk["downsample_bn"] = _fold_bn(sd, p + ".downsample.1")
        out[f"block{i}"] = blk
    return out


def convert_state_dict(sd: Mapping[str, np.ndarray]) -> dict:
    """torch state dict -> {'params': ...} for AttrRCNNModule."""
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    backbone = {
        "stem_conv1": _conv(sd, "backbone.body.stem.conv1"),
        "stem_bn1": _fold_bn(sd, "backbone.body.stem.bn1"),
        "layer1": _stage(sd, "backbone.body.layer1", 3),
        "layer2": _stage(sd, "backbone.body.layer2", 8),
        "layer3": _stage(sd, "backbone.body.layer3", 36),
    }
    rpn_head = {
        "conv": _conv_b(sd, "rpn.head.conv"),
        "cls_logits": _conv_b(sd, "rpn.head.cls_logits"),
        "bbox_pred": _conv_b(sd, "rpn.head.bbox_pred"),
    }
    box_head = {
        "head": {"layer4": _stage(
            sd, "roi_heads.box.feature_extractor.head.layer4", 3)},
        "predictor": {
            "cls_score": _lin(sd, "roi_heads.box.predictor.cls_score"),
            "bbox_pred": _lin(sd, "roi_heads.box.predictor.bbox_pred"),
        },
    }
    return {"params": {"backbone": backbone, "rpn_head": rpn_head,
                       "box_head": box_head}}


def load_npz(path: str) -> dict:
    """Rebuild the nested variables dict from a converted .npz
    (tools/convert_vinvl.py writes '/'-joined flat keys)."""
    data = np.load(path)
    out: dict = {}
    for key in data.files:
        parts = key.split("/")
        d = out
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = data[key]
    return out


def load_checkpoint(path: str) -> dict:
    """Load converted variables: .npz (torch-free runtime path) or a raw
    torch .pth (converted on the fly)."""
    if path.endswith(".npz"):
        return load_npz(path)
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt.get("state_dict", ckpt))
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    return convert_state_dict(sd)

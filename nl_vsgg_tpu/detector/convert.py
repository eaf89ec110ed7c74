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
feature_group_count uses the same per-group output blocking as torch), then
expanded block-diagonally to the per-stage EFF_GROUPS packing
(resnet.py::pack_grouped_kernel — exact, the extra multiplies hit stored
zeros); linear (O, I) -> (I, O); FrozenBatchNorm2d (weight, bias,
running_mean, running_var) folds into (scale, bias) with the reference's
eps=0 form `scale = weight * running_var.rsqrt()`.

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


def _stage(sd, src_prefix: str, n_blocks: int, stage_key: str | None = None,
           groups: int = 32) -> dict:
    from .resnet import EFF_GROUPS, pack_grouped_kernel
    eff = EFF_GROUPS.get(stage_key, groups) if stage_key else groups
    out = {}
    for i in range(n_blocks):
        p = f"{src_prefix}.{i}"
        conv2 = _conv(sd, p + ".conv2")
        conv2["kernel"] = pack_grouped_kernel(conv2["kernel"], groups, eff)
        blk = {
            "conv1": _conv(sd, p + ".conv1"), "bn1": _fold_bn(sd, p + ".bn1"),
            "conv2": conv2, "bn2": _fold_bn(sd, p + ".bn2"),
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
        "layer1": _stage(sd, "backbone.body.layer1", 3, "layer1"),
        "layer2": _stage(sd, "backbone.body.layer2", 8, "layer2"),
        "layer3": _stage(sd, "backbone.body.layer3", 36, "layer3"),
    }
    rpn_head = {
        "conv": _conv_b(sd, "rpn.head.conv"),
        "cls_logits": _conv_b(sd, "rpn.head.cls_logits"),
        "bbox_pred": _conv_b(sd, "rpn.head.bbox_pred"),
    }
    box_head = {
        "head": {"layer4": _stage(
            sd, "roi_heads.box.feature_extractor.head.layer4", 3, "layer4")},
        "predictor": {
            "cls_score": _lin(sd, "roi_heads.box.predictor.cls_score"),
            "bbox_pred": _lin(sd, "roi_heads.box.predictor.bbox_pred"),
        },
    }
    return {"params": {"backbone": backbone, "rpn_head": rpn_head,
                       "box_head": box_head}}


def save_npz(variables: dict, dst: str) -> int:
    """Flatten the nested variables dict to '/'-joined keys and write a
    compressed .npz (the inverse of load_npz). Returns the array count.
    The single definition of the flat key scheme — tools/convert_vinvl.py
    and tools/acceptance.py both write through here."""
    import jax
    flat = {"/".join(str(getattr(k, "key", k)) for k in path): np.asarray(leaf)
            for path, leaf in jax.tree_util.tree_leaves_with_path(variables)}
    np.savez_compressed(dst, **flat)
    return len(flat)


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


def _expand_legacy_groups(variables: dict, groups: int = 32) -> dict:
    """Expand conv2 kernels of an npz written before group packing (compact
    (3, 3, C/32, C) layout) to the module's current EFF_GROUPS shapes."""
    from .resnet import EFF_GROUPS, pack_grouped_kernel
    params = variables.get("params", {})
    stages = [(params.get("backbone", {}), k) for k in ("layer1", "layer2", "layer3")]
    stages.append((params.get("box_head", {}).get("head", {}), "layer4"))
    # expand whenever the stored in-dim matches the compact grouped layout
    # but the stage wants a wider packing
    for parent, key in stages:
        eff = EFF_GROUPS[key]
        for blk in parent.get(key, {}).values():
            conv2 = blk.get("conv2")
            if not conv2:
                continue
            k = conv2["kernel"]
            c = k.shape[3]
            if eff != groups and k.shape[2] == c // groups:
                conv2["kernel"] = pack_grouped_kernel(np.asarray(k), groups, eff)
    return variables


def load_checkpoint(path: str) -> dict:
    """Load converted variables: .npz (torch-free runtime path) or a raw
    torch .pth (converted on the fly)."""
    if path.endswith(".npz"):
        return _expand_legacy_groups(load_npz(path))
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt.get("state_dict", ckpt))
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    return convert_state_dict(sd)

"""Per-stage activation validation of checkpoint conversions.

Usage:
  python tools/validate_ckpt.py vinvl path/to/vinvl_vg_x152c4.pth
  python tools/validate_ckpt.py clip  path/to/LLM_cp.pt

The R@K story is gated on feature parity with the reference's frozen
detectors — VinVL `vinvl_vg_x152c4.pth` (ref lib/assign_pseudo_label.py:
973-1000, models/vinvl/vinvl_x152c4.yaml) and DAC CLIP `LLM_cp.pt`
(ref NL-VSGG/ADV.py:48-52). The converters (detector/convert.py,
pipelines/clip_jax.py) are parity-tested on synthetic weights; this tool runs
the moment the real checkpoint file is present and prints the max-abs
activation difference per stage between

  * a minimal functional-torch evaluation of the checkpoint's own tensors
    (ground truth: exactly the stored weights, torch conv/linear semantics),
  * the converted flax modules (NHWC / folded-FrozenBN / transposed linears).

Stages: stem -> C2 -> C3 -> C4 (backbone), RPN head, C5 box head, predictor.
Attribute-head keys (`roi_heads.attribute.*`) are NOT converted or validated:
no NL-VSGG path consumes attribute logits (the pipeline reads boxes +
`box_features` only, ref NL-VSGG/data_preprocess/extract_bbox_features_ag.py:
110-119) — they are reported as a skip count, not an error. The same applies
to `rpn.anchor_generator.*` buffers (anchors are recomputed closed-form in
detector/anchors.py).

Exits non-zero if any stage diff exceeds --atol RELATIVE to the stage's
activation scale — the check is `max|dx| <= atol * max(1, |ref|max)`, so a
C4 map peaking at 50 passes up to 5e-2 absolute at the default 1e-3
(activation magnitudes vary ~100x across stages; a single absolute
threshold would be meaninglessly loose or tight somewhere). (fp32 CPU both
sides, differences are conv summation order only).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ATTR_SKIP_PREFIXES = ("roi_heads.attribute.", "rpn.anchor_generator.")


# ---------------------------------------------------------------- torch side
def _t_conv(x, sd, key, stride=1, padding=0, groups=1):
    import torch.nn.functional as F
    w = sd[key + ".weight"]
    b = sd.get(key + ".bias")
    return F.conv2d(x, w, b, stride=stride, padding=padding, groups=groups)


def _t_frozen_bn(x, sd, key, eps=0.0):
    w, b = sd[key + ".weight"], sd[key + ".bias"]
    mean, var = sd[key + ".running_mean"], sd[key + ".running_var"]
    scale = w / (var + eps).sqrt()
    shift = b - mean * scale
    return x * scale[:, None, None] + shift[:, None, None]


def _t_bottleneck(x, sd, p, stride, groups=32):
    import torch.nn.functional as F
    h = F.relu(_t_frozen_bn(_t_conv(x, sd, p + ".conv1"), sd, p + ".bn1"))
    h = F.relu(_t_frozen_bn(
        _t_conv(h, sd, p + ".conv2", stride=stride, padding=1, groups=groups),
        sd, p + ".bn2"))
    h = _t_frozen_bn(_t_conv(h, sd, p + ".conv3"), sd, p + ".bn3")
    if p + ".downsample.0.weight" in sd:
        idn = _t_frozen_bn(_t_conv(x, sd, p + ".downsample.0", stride=stride),
                           sd, p + ".downsample.1")
    else:
        idn = x
    return F.relu(h + idn)


def _t_stage(x, sd, prefix, n_blocks, first_stride):
    for i in range(n_blocks):
        x = _t_bottleneck(x, sd, f"{prefix}.{i}", first_stride if i == 0 else 1)
    return x


def torch_stages(sd, image_nchw, crop_nchw, pooled_nc):
    """Ground-truth per-stage activations from the raw checkpoint tensors."""
    import torch
    import torch.nn.functional as F
    with torch.no_grad():
        x = torch.as_tensor(image_nchw)
        out = {}
        h = _t_frozen_bn(_t_conv(x, sd, "backbone.body.stem.conv1",
                                 stride=2, padding=3), sd, "backbone.body.stem.bn1")
        out["stem"] = h
        h = F.max_pool2d(F.relu(h), 3, stride=2, padding=1)
        h = _t_stage(h, sd, "backbone.body.layer1", 3, 1)
        out["C2"] = h
        h = _t_stage(h, sd, "backbone.body.layer2", 8, 2)
        out["C3"] = h
        h = _t_stage(h, sd, "backbone.body.layer3", 36, 2)
        out["C4"] = h
        t = F.relu(_t_conv(h, sd, "rpn.head.conv", padding=1))
        out["rpn_logits"] = _t_conv(t, sd, "rpn.head.cls_logits")
        out["rpn_deltas"] = _t_conv(t, sd, "rpn.head.bbox_pred")
        crop = torch.as_tensor(crop_nchw)
        c5 = _t_stage(crop, sd, "roi_heads.box.feature_extractor.head.layer4", 3, 2)
        out["C5"] = c5
        pooled = torch.as_tensor(pooled_nc)
        out["cls_score"] = F.linear(pooled, sd["roi_heads.box.predictor.cls_score.weight"],
                                    sd["roi_heads.box.predictor.cls_score.bias"])
        out["bbox_pred"] = F.linear(pooled, sd["roi_heads.box.predictor.bbox_pred.weight"],
                                    sd["roi_heads.box.predictor.bbox_pred.bias"])
        return {k: v.numpy() for k, v in out.items()}


# ----------------------------------------------------------------- jax side
def jax_stages(variables, image_nchw, crop_nchw, pooled_nc):
    """The same cut points through the converted flax modules (NHWC)."""
    import jax.numpy as jnp

    from nl_vsgg_tpu.detector.resnet import ResNeXt152C4, ResNeXtC5Head
    from nl_vsgg_tpu.detector.roi_box import BoxPredictor
    from nl_vsgg_tpu.detector.rpn import RPNHead

    def to_nhwc(a):
        return jnp.asarray(np.moveaxis(a, 1, -1))

    def to_nchw(a):
        return np.moveaxis(np.asarray(a), -1, 1)

    out = {}
    img = to_nhwc(image_nchw)
    bb = ResNeXt152C4()
    c4, inter = bb.apply({"params": variables["params"]["backbone"]}, img,
                         capture_intermediates=True)
    inter = inter["intermediates"]
    out["stem"] = to_nchw(inter["stem_bn1"]["__call__"][0])
    out["C2"] = to_nchw(inter["layer1"]["__call__"][0])
    out["C3"] = to_nchw(inter["layer2"]["__call__"][0])
    out["C4"] = to_nchw(c4)
    logits, deltas = RPNHead().apply(
        {"params": variables["params"]["rpn_head"]}, c4)
    out["rpn_logits"] = to_nchw(logits)
    out["rpn_deltas"] = to_nchw(deltas)
    c5 = ResNeXtC5Head().apply(
        {"params": variables["params"]["box_head"]["head"]}, to_nhwc(crop_nchw))
    out["C5"] = to_nchw(c5)
    # predictor pools (N,7,7,2048); feed the pooled vector pre-broadcast so
    # both sides see identical linear inputs
    pooled77 = jnp.broadcast_to(jnp.asarray(pooled_nc)[:, None, None, :],
                                (pooled_nc.shape[0], 7, 7, pooled_nc.shape[1]))
    scores, bdeltas = BoxPredictor().apply(
        {"params": variables["params"]["box_head"]["predictor"]}, pooled77)
    out["cls_score"] = np.asarray(scores)
    out["bbox_pred"] = np.asarray(bdeltas)
    return out


def validate_vinvl(sd, atol=1e-3, image_hw=(96, 128), seed=0,
                   log=print) -> dict[str, float]:
    """sd: raw torch state dict (tensors). Returns {stage: max_abs_diff}."""
    import torch

    from nl_vsgg_tpu.detector.convert import convert_state_dict

    sd = {k.removeprefix("module."): torch.as_tensor(np.asarray(v)).float()
          for k, v in sd.items()}
    skipped = [k for k in sd if k.startswith(ATTR_SKIP_PREFIXES)]
    variables = convert_state_dict({k: v.numpy() for k, v in sd.items()
                                    if k not in set(skipped)})

    rng = np.random.default_rng(seed)
    image = rng.standard_normal((1, 3, *image_hw)).astype(np.float32)
    crop = rng.standard_normal((2, 1024, 14, 14)).astype(np.float32)
    pooled = rng.standard_normal((2, 2048)).astype(np.float32)

    ref = torch_stages(sd, image, crop, pooled)
    got = jax_stages(variables, image, crop, pooled)
    diffs = {}
    ok = True
    for stage in ref:
        d = float(np.abs(ref[stage] - got[stage]).max())
        scale = float(np.abs(ref[stage]).max()) or 1.0
        diffs[stage] = d
        status = "ok" if d <= atol * max(1.0, scale) else "FAIL"
        ok &= status == "ok"
        log(f"  {stage:<10} max|Δ| = {d:.3e}  (|ref|max {scale:.2e})  {status}")
    log(f"  skipped {len(skipped)} attribute/anchor keys (unused by NL-VSGG)")
    diffs["_ok"] = float(ok)
    return diffs


def validate_clip(path, atol=5e-3, log=print) -> dict[str, float]:
    """DAC LLM_cp.pt -> pipelines/clip_jax per-stage diff (text + vision
    towers on fixed inputs), via the converter's own torch-side blocks."""
    from nl_vsgg_tpu.pipelines import clip_jax
    return clip_jax.validate_checkpoint(path, atol=atol, log=log)


def main():
    p = argparse.ArgumentParser(description="checkpoint conversion validation")
    p.add_argument("kind", choices=["vinvl", "clip"])
    p.add_argument("ckpt", help=".pth/.pt checkpoint path")
    p.add_argument("--atol", type=float, default=1e-3,
                   help="per-stage threshold, RELATIVE to the stage's max |ref| activation (>=1)")
    args = p.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")  # fp32 parity run, not a benchmark

    if args.kind == "vinvl":
        import torch
        ckpt = torch.load(args.ckpt, map_location="cpu", weights_only=False)
        sd = ckpt.get("model", ckpt.get("state_dict", ckpt))
        diffs = validate_vinvl(sd, atol=args.atol)
    else:
        diffs = validate_clip(args.ckpt, atol=args.atol)
    sys.exit(0 if diffs.pop("_ok", 0.0) else 1)


if __name__ == "__main__":
    main()

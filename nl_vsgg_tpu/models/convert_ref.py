"""Reference torch checkpoint -> nl_vsgg_tpu params for the relation models.

The reference's tools load `{'state_dict': ...}` torch checkpoints
(/root/reference/tools/test_STTran.py:51-52); a user switching from the
reference brings exactly those files. This module maps the state_dict keys of
the reference `STTran` (lib/sttran.py:314-372 + lib/transformer_wk.py:104-127)
and DSG-DETR (lib/dsg_detr.py:464-511) onto our flax param/batch_stats trees,
applying every layout conversion the golden parity tests pin
(tests/test_model_parity.py):

  * Linear weight (out, in) -> kernel (in, out)
  * Conv2d (out, in, kh, kw) -> NHWC kernel (kh, kw, in, out)
  * the 1x1 `union_func1` conv -> a channel-axis Dense kernel (in, out)
  * `vr_fc`'s input flatten order: torch (C, 7, 7) -> ours (7, 7, C)
  * torch MultiheadAttention packed in_proj -> split q/k/v projections
  * BatchNorm weight/bias -> scale/bias params + running stats into
    batch_stats (the masked-BN layers read the same torch buffers)
  * embedding tables passed through as-is — including the 37-row
    `obj_embed`/`obj_embed2` quirk (the reference declares len-1 rows but
    overwrites .weight.data with the 37-row GloVe table; a trained
    checkpoint therefore carries 37 rows and round-trips unchanged)

Works on raw state_dicts (numpy or torch tensors); `module.` DataParallel
prefixes are stripped. Unconsumed keys are returned so callers can report
them (the reference's own loaders use strict=False).
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _np(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


class _SD:
    """state_dict view that records which keys were consumed."""

    def __init__(self, sd: Mapping[str, Any]):
        self.sd = {k[len("module."):] if k.startswith("module.") else k: v
                   for k, v in sd.items()}
        self.used: set[str] = set()

    def __contains__(self, key: str) -> bool:
        return key in self.sd

    def take(self, key: str) -> np.ndarray:
        self.used.add(key)
        return _np(self.sd[key])

    def unused(self) -> list[str]:
        # num_batches_tracked carries no information our BN uses
        return sorted(k for k in self.sd if k not in self.used
                      and not k.endswith("num_batches_tracked"))


def _lin(sd: _SD, p: str) -> dict:
    return {"kernel": sd.take(p + ".weight").T, "bias": sd.take(p + ".bias")}


def _ln(sd: _SD, p: str) -> dict:
    return {"scale": sd.take(p + ".weight"), "bias": sd.take(p + ".bias")}


def _bn(sd: _SD, p: str) -> tuple[dict, dict]:
    return ({"scale": sd.take(p + ".weight"), "bias": sd.take(p + ".bias")},
            {"mean": sd.take(p + ".running_mean"),
             "var": sd.take(p + ".running_var")})


def _conv(sd: _SD, p: str) -> dict:
    return {"kernel": sd.take(p + ".weight").transpose(2, 3, 1, 0),
            "bias": sd.take(p + ".bias")}


def _mha(sd: _SD, p: str) -> dict:
    qw, kw, vw = np.split(sd.take(p + ".in_proj_weight"), 3, 0)
    qb, kb, vb = np.split(sd.take(p + ".in_proj_bias"), 3, 0)
    return {"q_proj": {"kernel": qw.T, "bias": qb},
            "k_proj": {"kernel": kw.T, "bias": kb},
            "v_proj": {"kernel": vw.T, "bias": vb},
            "out_proj": _lin(sd, p + ".out_proj")}


def _vr_fc(sd: _SD, p: str) -> dict:
    w = sd.take(p + ".weight")  # (512, 256*49), input idx = c*49 + h*7 + w
    out = w.shape[0]
    w = w.reshape(out, 256, 7, 7).transpose(0, 2, 3, 1).reshape(out, 256 * 49)
    return {"kernel": w.T, "bias": sd.take(p + ".bias")}


def _encoder_layer(sd: _SD, p: str) -> dict:
    return {"self_attn": _mha(sd, p + ".self_attn"),
            "linear1": _lin(sd, p + ".linear1"),
            "linear2": _lin(sd, p + ".linear2"),
            "norm1": _ln(sd, p + ".norm1"), "norm2": _ln(sd, p + ".norm2")}


def _object_classifier_wk(sd: _SD, p: str) -> tuple[dict, dict]:
    bn_pos, bs_pos = _bn(sd, p + ".pos_embed.0")
    bn_dec, bs_dec = _bn(sd, p + ".decoder_lin.1")
    params = {"obj_embed": sd.take(p + ".obj_embed.weight"),
              "pos_bn": bn_pos, "pos_fc": _lin(sd, p + ".pos_embed.1"),
              "decoder_fc1": _lin(sd, p + ".decoder_lin.0"),
              "decoder_bn": bn_dec,
              "decoder_fc2": _lin(sd, p + ".decoder_lin.3")}
    return params, {"pos_bn": bs_pos, "decoder_bn": bs_dec}


def _common_head(sd: _SD) -> tuple[dict, dict]:
    """Everything STTran and DSG-DETR share (visual/semantic fusion + heads +
    the weak-supervision object classifier)."""
    oc_p, oc_s = _object_classifier_wk(sd, "object_classifier")
    bn1, bs1 = _bn(sd, "conv.2")
    bn2, bs2 = _bn(sd, "conv.6")
    params = {
        "object_classifier": oc_p,
        "subj_fc": _lin(sd, "subj_fc"), "obj_fc": _lin(sd, "obj_fc"),
        "vr_fc": _vr_fc(sd, "vr_fc"),
        "union_func1": {
            "kernel": sd.take("union_func1.weight")[:, :, 0, 0].T,
            "bias": sd.take("union_func1.bias")},
        "spatial_conv": {"conv1": _conv(sd, "conv.0"), "bn1": bn1,
                         "conv2": _conv(sd, "conv.4"), "bn2": bn2},
        "obj_embed": sd.take("obj_embed.weight"),
        "obj_embed2": sd.take("obj_embed2.weight"),
        "a_rel_compress": _lin(sd, "a_rel_compress"),
        "s_rel_compress": _lin(sd, "s_rel_compress"),
        "c_rel_compress": _lin(sd, "c_rel_compress"),
    }
    stats = {"object_classifier": oc_s,
             "spatial_conv": {"bn1": bs1, "bn2": bs2}}
    return params, stats


def _count_layers(sd: _SD, fmt: str) -> int:
    n = 0
    while fmt.format(n) + ".linear1.weight" in sd:
        n += 1
    return n


def detect_family(sd: Mapping[str, Any]) -> str:
    """'sttran' (glocal_transformer.*) or 'dsg_detr' (global_transformer.*)."""
    keys = set(sd)
    if any(k.startswith(("glocal_transformer.", "module.glocal_transformer."))
           for k in keys):
        return "sttran"
    if any(k.startswith(("global_transformer.", "module.global_transformer."))
           for k in keys):
        return "dsg_detr"
    raise ValueError("state_dict matches neither the reference STTran "
                     "(glocal_transformer.*) nor DSG-DETR "
                     "(global_transformer.*) layout")


def convert_sttran(sd: Mapping[str, Any]) -> tuple[dict, dict, list[str]]:
    """-> (params, batch_stats, unused_keys) for models.sttran.STTran."""
    sd = _SD(sd)
    params, stats = _common_head(sd)
    tr = {"position_embedding":
          sd.take("glocal_transformer.position_embedding.weight")}
    enc = _count_layers(sd, "glocal_transformer.local_attention.layers.{}")
    dec = _count_layers(sd, "glocal_transformer.global_attention.layers.{}")
    for i in range(enc):
        tr[f"enc_{i}"] = _encoder_layer(
            sd, f"glocal_transformer.local_attention.layers.{i}")
    for i in range(dec):
        p = f"glocal_transformer.global_attention.layers.{i}"
        tr[f"dec_{i}"] = {"multihead2": _mha(sd, p + ".multihead2"),
                          "linear1": _lin(sd, p + ".linear1"),
                          "linear2": _lin(sd, p + ".linear2"),
                          "norm3": _ln(sd, p + ".norm3")}
    params["glocal_transformer"] = tr
    return params, stats, sd.unused()


def convert_dsg_detr(sd: Mapping[str, Any]) -> tuple[dict, dict, list[str]]:
    """-> (params, batch_stats, unused_keys) for models.dsg_detr.DSGDETR."""
    sd = _SD(sd)
    params, stats = _common_head(sd)
    for i in range(_count_layers(sd, "local_transformer.layers.{}")):
        params[f"local_{i}"] = _encoder_layer(
            sd, f"local_transformer.layers.{i}")
    for i in range(_count_layers(sd, "global_transformer.layers.{}")):
        params[f"global_{i}"] = _encoder_layer(
            sd, f"global_transformer.layers.{i}")
    return params, stats, sd.unused()


def convert(sd: Mapping[str, Any], family: str | None = None
            ) -> tuple[dict, dict, list[str], str]:
    family = family or detect_family(sd)
    fn = {"sttran": convert_sttran, "dsg_detr": convert_dsg_detr}[family]
    params, stats, unused = fn(sd)
    return params, stats, unused, family

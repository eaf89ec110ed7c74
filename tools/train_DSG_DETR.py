"""Train DSG-DETR on Action Genome with weak supervision (TPU-native).

Mirrors tools/train_DSG_DETR.py: identical loop to STTran training plus the
HungarianMatcher(0.5, 1, 1, 0.5) / get_sequence machinery (:113, 134). In the
shipped weak-supervision sgdet path the reference calls get_sequence *after*
the model consumed the entry (tools/train_DSG_DETR.py:133-134), so the
tracklet indices never influence training — our DSGDETR derives its temporal
groups from object classes inside the model, which is the same computation
the sgdet fast path performs (lib/track.py:135-152).

The loop itself is train_STTran.run_training, parameterized by the model
builder (the reference duplicates the whole training file instead).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nl_vsgg_tpu.models.dsg_detr import DSGDETR
from nl_vsgg_tpu.utils.config import load_config
from nl_vsgg_tpu.utils.glove import obj_edge_vectors

from train_STTran import parse_args, run_training


def build_model(cfg, tax):
    from train_STTran import compute_dtype
    g36 = obj_edge_vectors(list(tax.object_classes[1:]), 200, cfg.glove_path)
    g37 = obj_edge_vectors(list(tax.object_classes), 200, cfg.glove_path)
    return DSGDETR(mode=cfg.mode, obj_classes=tuple(tax.object_classes),
                   enc_layer_num=1, dec_layer_num=3,
                   feat_dim=cfg.feat_dim, glove_obj36=g36, glove_obj37=g37,
                   dtype=compute_dtype(cfg), remat=cfg.remat,
                   fused=cfg.fused_attention)


def main():
    args = parse_args()
    overrides = {}
    if args.bce_loss:
        overrides["bce_loss"] = True
    if args.nepoch is not None:
        overrides["nepoch"] = args.nepoch
    cfg = load_config(args.cfg_file, overrides)
    run_training(cfg, args, build_model)


if __name__ == "__main__":
    main()

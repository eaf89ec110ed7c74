"""Convert a reference-trained relation-model checkpoint to our format.

The reference saves/loads `{'state_dict': ...}` torch checkpoints
(/root/reference/tools/test_STTran.py:51-52); a user switching from the
reference evaluates theirs here with:

    python tools/convert_relation_ckpt.py --ckpt sttran.tar --out ckpt_dir
    python tools/test_STTran.py --cfg cfg.yml --model_path ckpt_dir

The model family (STTran vs DSG-DETR), encoder/decoder depth and feature
width are detected from the state_dict itself; the result is a standard
Orbax TrainState checkpoint (step 0, fresh optimizer) usable by
tools/test_*.py, tools/predict.py, and as a training warm start.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def _tree_paths(tree) -> set[str]:
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {jax.tree_util.keystr(path) for path, _ in flat}


def load_state_dict(path: str) -> dict:
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    if not isinstance(obj, dict):
        raise ValueError(f"{path}: expected a state_dict or "
                         "{'state_dict': ...} checkpoint")
    return obj


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", required=True, help="reference torch checkpoint")
    p.add_argument("--out", required=True, help="output Orbax checkpoint dir")
    p.add_argument("--cfg", dest="cfg_file", default=None,
                   help="config yaml (mode etc.; architecture is detected "
                        "from the checkpoint)")
    p.add_argument("--family", choices=["sttran", "dsg_detr"], default=None,
                   help="override the auto-detected model family")
    args = p.parse_args(argv)

    from nl_vsgg_tpu.data.synthetic import make_synthetic_entry
    from nl_vsgg_tpu.models.convert_ref import convert
    from nl_vsgg_tpu.models.dsg_detr import DSGDETR
    from nl_vsgg_tpu.models.sttran import STTran
    from nl_vsgg_tpu.train import create_train_state, make_optimizer
    from nl_vsgg_tpu.utils.checkpoint import save_checkpoint
    from nl_vsgg_tpu.utils.config import load_config
    from nl_vsgg_tpu.utils.logging import setup_logger

    logger = setup_logger()
    cfg = load_config(args.cfg_file)
    sd = load_state_dict(args.ckpt)
    params, stats, unused, family = convert(sd, args.family)

    # architecture from the weights, not the config: the checkpoint defines it
    feat_dim = int(params["subj_fc"]["kernel"].shape[0])
    if family == "sttran":
        enc = sum(1 for k in params["glocal_transformer"] if k.startswith("enc_"))
        dec = sum(1 for k in params["glocal_transformer"] if k.startswith("dec_"))
        model = STTran(mode=cfg.mode, feat_dim=feat_dim, enc_layer_num=enc,
                       dec_layer_num=dec)
    else:
        enc = sum(1 for k in params if k.startswith("local_"))
        dec = sum(1 for k in params if k.startswith("global_"))
        model = DSGDETR(mode=cfg.mode, feat_dim=feat_dim, enc_layer_num=enc,
                        dec_layer_num=dec)
    if (enc, dec, feat_dim) != (cfg.enc_layer, cfg.dec_layer, cfg.feat_dim):
        logger.info(f"architecture from checkpoint: enc={enc} dec={dec} "
                    f"feat_dim={feat_dim} (config said {cfg.enc_layer}/"
                    f"{cfg.dec_layer}/{cfg.feat_dim}; checkpoint wins)")

    entry = make_synthetic_entry(np.random.default_rng(0), n_frames=3,
                                 objs_per_frame=2, bucket_boxes=16,
                                 bucket_rels=16, feat_dim=feat_dim)
    state, _ = create_train_state(model, entry, jax.random.key(0),
                                  tx=make_optimizer(cfg.lr))

    params = jax.tree.map(jnp.asarray, params)
    stats = jax.tree.map(jnp.asarray, stats)
    for name, ours, theirs in (("params", state.params, params),
                               ("batch_stats", state.batch_stats, stats)):
        missing = _tree_paths(ours) - _tree_paths(theirs)
        extra = _tree_paths(theirs) - _tree_paths(ours)
        if missing or extra:
            raise ValueError(
                f"converted {name} tree does not match the {family} model: "
                f"missing={sorted(missing)} extra={sorted(extra)}")
    for path, leaf in jax.tree_util.tree_flatten_with_path(state.params)[0]:
        got = params
        for k in path:
            got = got[k.key]
        if tuple(np.shape(got)) != tuple(leaf.shape):
            raise ValueError(f"shape mismatch at {jax.tree_util.keystr(path)}: "
                             f"checkpoint {np.shape(got)} vs model {leaf.shape}")
    state = state.replace(params=params, batch_stats=stats)
    path = save_checkpoint(args.out, 0, state, config_json=cfg.to_json())
    logger.info(f"converted {family} checkpoint (enc={enc} dec={dec} "
                f"feat_dim={feat_dim}) -> {path}")
    if unused:
        logger.info(f"{len(unused)} unconsumed checkpoint keys (the "
                    f"reference's own loaders use strict=False): "
                    f"{unused[:8]}{' ...' if len(unused) > 8 else ''}")
    return path


if __name__ == "__main__":
    main()

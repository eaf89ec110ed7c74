"""tools/predict.py — annotation-free scene-graph export over cached
VinVL features (the serving path the reference lacks)."""

import json
import os
import sys

import numpy as np
import pytest

from tests.fixtures import build_micro_ag, load_tool as _load_tool


@pytest.mark.slow
def test_predict_exports_scene_graphs(tmp_path, monkeypatch):
    import jax
    import yaml

    from nl_vsgg_tpu.data import schema
    from nl_vsgg_tpu.train import create_train_state, make_optimizer
    from nl_vsgg_tpu.utils.checkpoint import save_checkpoint
    from nl_vsgg_tpu.utils.config import load_config

    ag = build_micro_ag(str(tmp_path), n_videos=2, n_frames=3, feat_dim=32)
    feat_root = os.path.join(ag, "frame_features")
    cfg_dict = {"mode": "sgdet", "feat_dim": 32, "enc_layer": 1, "dec_layer": 1,
                "data_path": ag, "frame_features_path": feat_root,
                "save_path": str(tmp_path / "out")}
    cfg_path = str(tmp_path / "cfg.yml")
    with open(cfg_path, "w") as f:
        yaml.dump(cfg_dict, f)
    cfg = load_config(cfg_path)

    # untrained-but-real checkpoint: predict's contract is the pipeline, not
    # the R@K quality of a 2-video model
    train = _load_tool("train_STTran")
    tax = schema.load_taxonomy()
    model = train.build_model(cfg, tax)
    ds_like = type("DS", (), {})()
    ds_like.video_list = [[os.path.join(v, fr) for fr in sorted(os.listdir(os.path.join(feat_root, v)))]
                          for v in sorted(os.listdir(feat_root))]
    ds_like.gt_annotations = [[[] for _ in fl] for fl in ds_like.video_list]
    sample = train.ground_video(ds_like, 0, cfg, False, cfg.buckets)
    assert sample is not None
    state, _ = create_train_state(model, sample, jax.random.key(0),
                                  tx=make_optimizer(1e-4))
    ckpt_dir = str(tmp_path / "ckpt")
    save_checkpoint(ckpt_dir, 0, state)

    out_path = str(tmp_path / "graphs.jsonl")
    predict = _load_tool("predict")
    monkeypatch.setattr(sys, "argv", [
        "predict.py", "--cfg", cfg_path, "--model_path", ckpt_dir,
        "--features_dir", feat_root, "--out", out_path, "--topk", "20"])
    predict.main()

    lines = [json.loads(l) for l in open(out_path)]
    assert len(lines) == 2
    rel_names = set(tax.relationship_classes)
    obj_names = set(tax.object_classes)
    for sg in lines:
        assert sg["num_frames"] == 3
        assert sg["objects"], "no objects exported"
        assert any(o["label"] == "person" for o in sg["objects"])
        assert sg["triplets"] and len(sg["triplets"]) <= 20
        scores = [t["ranking_score"] for t in sg["triplets"]]
        assert scores == sorted(scores, reverse=True)
        for t in sg["triplets"]:
            assert t["predicate"] in rel_names
            s, o = t["subject"], t["object"]
            assert 0 <= s < len(sg["objects"]) and 0 <= o < len(sg["objects"])
            assert sg["objects"][s]["label"] == "person"
            assert sg["objects"][s]["frame"] == sg["objects"][o]["frame"] == t["frame"]
            assert sg["objects"][o]["label"] in obj_names
        # boxes are xyxy within the fixture's 640x480 canvas
        for o in sg["objects"]:
            x1, y1, x2, y2 = o["box"]
            assert x1 < x2 and y1 < y2


@pytest.mark.slow
def test_predict_dsg_detr_flag(tmp_path, monkeypatch):
    """--dsg_detr serves a DSG-DETR checkpoint through the same export path."""
    import jax
    import yaml

    from nl_vsgg_tpu.data import schema
    from nl_vsgg_tpu.train import create_train_state, make_optimizer
    from nl_vsgg_tpu.utils.checkpoint import save_checkpoint
    from nl_vsgg_tpu.utils.config import load_config

    ag = build_micro_ag(str(tmp_path), n_videos=1, n_frames=3, feat_dim=32)
    feat_root = os.path.join(ag, "frame_features")
    cfg_path = str(tmp_path / "cfg.yml")
    with open(cfg_path, "w") as f:
        yaml.dump({"mode": "sgdet", "feat_dim": 32,
                   "data_path": ag, "frame_features_path": feat_root,
                   "save_path": str(tmp_path / "out")}, f)
    cfg = load_config(cfg_path)

    train = _load_tool("train_STTran")
    dsg = _load_tool("train_DSG_DETR")
    tax = schema.load_taxonomy()
    model = dsg.build_model(cfg, tax)
    ds_like = type("DS", (), {})()
    ds_like.video_list = [[os.path.join(v, fr) for fr in
                           sorted(os.listdir(os.path.join(feat_root, v)))]
                          for v in sorted(os.listdir(feat_root))]
    ds_like.gt_annotations = [[[] for _ in fl] for fl in ds_like.video_list]
    sample = train.ground_video(ds_like, 0, cfg, False, cfg.buckets)
    state, _ = create_train_state(model, sample, jax.random.key(0),
                                  tx=make_optimizer(1e-4))
    ckpt_dir = str(tmp_path / "ckpt_dsg")
    save_checkpoint(ckpt_dir, 0, state)

    out_path = str(tmp_path / "graphs_dsg.jsonl")
    predict = _load_tool("predict")
    monkeypatch.setattr(sys, "argv", [
        "predict.py", "--cfg", cfg_path, "--model_path", ckpt_dir,
        "--features_dir", feat_root, "--out", out_path, "--topk", "10",
        "--dsg_detr"])
    predict.main()
    lines = [json.loads(l) for l in open(out_path)]
    assert len(lines) == 1 and lines[0]["triplets"]


@pytest.mark.slow
def test_predict_skips_corrupt_video(tmp_path, monkeypatch):
    """A corrupt feature directory must not abort the batch export."""
    import shutil

    import jax
    import yaml

    from nl_vsgg_tpu.data import schema
    from nl_vsgg_tpu.train import create_train_state, make_optimizer
    from nl_vsgg_tpu.utils.checkpoint import save_checkpoint
    from nl_vsgg_tpu.utils.config import load_config

    ag = build_micro_ag(str(tmp_path), n_videos=3, n_frames=3, feat_dim=32)
    feat_root = os.path.join(ag, "frame_features")
    vids = sorted(os.listdir(feat_root))
    # corrupt the middle video: remove every feature file
    for frame in os.listdir(os.path.join(feat_root, vids[1])):
        shutil.rmtree(os.path.join(feat_root, vids[1], frame))
        os.makedirs(os.path.join(feat_root, vids[1], frame))

    cfg_path = str(tmp_path / "cfg.yml")
    with open(cfg_path, "w") as f:
        yaml.dump({"mode": "sgdet", "feat_dim": 32, "data_path": ag,
                   "frame_features_path": feat_root,
                   "save_path": str(tmp_path / "out")}, f)
    cfg = load_config(cfg_path)

    train = _load_tool("train_STTran")
    tax = schema.load_taxonomy()
    model = train.build_model(cfg, tax)
    ds_like = type("DS", (), {})()
    ds_like.video_list = [[os.path.join(vids[0], fr) for fr in
                           sorted(os.listdir(os.path.join(feat_root, vids[0])))]]
    ds_like.gt_annotations = [[[] for _ in ds_like.video_list[0]]]
    sample = train.ground_video(ds_like, 0, cfg, False, cfg.buckets)
    state, _ = create_train_state(model, sample, jax.random.key(0),
                                  tx=make_optimizer(1e-4))
    ckpt_dir = str(tmp_path / "ckpt")
    save_checkpoint(ckpt_dir, 0, state)

    out_path = str(tmp_path / "graphs.jsonl")
    predict = _load_tool("predict")
    monkeypatch.setattr(sys, "argv", [
        "predict.py", "--cfg", cfg_path, "--model_path", ckpt_dir,
        "--features_dir", feat_root, "--out", out_path])
    predict.main()
    lines = [json.loads(l) for l in open(out_path)]
    assert sorted(sg["video"] for sg in lines) == [vids[0], vids[2]]

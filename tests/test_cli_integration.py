"""End-to-end CLI integration: micro on-disk AG dataset -> train_STTran
(1 epoch, grounding + train + checkpoint + eval) -> test_STTran restore
reproduces the epoch evaluation bit-exactly."""

import os
import sys

import numpy as np
import pytest
import yaml

from tests.fixtures import build_micro_ag, load_tool as _load_tool


@pytest.mark.slow
def test_train_then_eval_roundtrip(tmp_path, monkeypatch, capsys):
    # 6 videos -> 3 train steps, so the profile_steps trace (starting at
    # global step 2) actually fires
    ag = build_micro_ag(str(tmp_path), n_videos=6, n_frames=3, feat_dim=32)
    cfg = {"mode": "sgdet", "lr": 1e-4, "nepoch": 1, "enc_layer": 1, "dec_layer": 1,
           "feat_dim": 32, "bce_loss": True, "batch_videos": 2, "data_path": ag,
           "pseudo_localized_SG_path": os.path.join(ag, "final_ag_data_w_neg.pkl"),
           "frame_features_path": os.path.join(ag, "frame_features"),
           "save_path": str(tmp_path / "out"),
           # exercise the observability/extra-eval knobs end-to-end
           "device_eval": True, "profile_steps": 1,
           # burn-in promotion of the on-device scorer (plateau metric)
           "device_eval_promote": True, "device_eval_burnin": 2}
    cfg_path = str(tmp_path / "cfg.yml")
    with open(cfg_path, "w") as f:
        yaml.dump(cfg, f)

    train = _load_tool("train_STTran")
    monkeypatch.setattr(sys, "argv", ["train_STTran.py", "--cfg", cfg_path])
    # capture the named logger directly (setup_logger sets propagate=False
    # and attaches its file handler at most once per process, so neither
    # caplog nor log.txt is a reliable sink across test orderings)
    import logging

    records: list[str] = []

    class _Capture(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    cap = _Capture()
    logging.getLogger("nl_vsgg_tpu").addHandler(cap)
    try:
        train.main()
    finally:
        logging.getLogger("nl_vsgg_tpu").removeHandler(cap)
    assert os.path.isdir(os.path.join(cfg["save_path"], "ckpt", "0"))
    assert os.path.isfile(os.path.join(cfg["save_path"], "metrics.jsonl"))
    assert os.path.isdir(os.path.join(cfg["save_path"], "trace"))  # profiler
    # the on-device scorer must agree with the host evaluator through
    # burn-in and take over the plateau metric (no silent fallback)
    assert any("device evaluator promoted" in m for m in records), \
        "\n".join(records[-40:])

    test = _load_tool("test_STTran")
    monkeypatch.setattr(sys, "argv", ["test_STTran.py", "--cfg", cfg_path,
                                      "--model_path",
                                      os.path.join(cfg["save_path"], "ckpt")])
    test.main()


@pytest.mark.slow
def test_device_entry_store_training_parity(tmp_path, monkeypatch):
    """Training with the device-resident Entry store (cfg.device_entry_store_gb)
    must be a pure data-path optimization: same seed + 1 prefetch worker ->
    the final checkpoint params are IDENTICAL to the streamed path (store
    batches are bit-identical to place_entries and rng keys by global step).
    Epoch 1 must actually be served from the store (log line)."""
    import logging

    import jax
    import numpy as np
    import orbax.checkpoint as ocp

    ag = build_micro_ag(str(tmp_path), n_videos=6, n_frames=3, feat_dim=32)
    base = {"mode": "sgdet", "lr": 1e-4, "nepoch": 2, "enc_layer": 1,
            "dec_layer": 1, "feat_dim": 32, "bce_loss": True,
            # mesh 1x1: single-device path on the 8-virtual-device conftest
            # host — the store tier is single-device (config.py)
            "mesh": {"data": 1, "model": 1},
            "batch_videos": 2, "num_workers": 1, "seed": 7, "data_path": ag,
            "pseudo_localized_SG_path": os.path.join(ag, "final_ag_data_w_neg.pkl"),
            "frame_features_path": os.path.join(ag, "frame_features")}
    train = _load_tool("train_STTran")
    params = {}
    for name, extra in (("stream", {}),
                        ("store", {"device_entry_store_gb": 1.0})):
        cfg = {**base, **extra, "save_path": str(tmp_path / f"out_{name}")}
        cfg_path = str(tmp_path / f"cfg_{name}.yml")
        with open(cfg_path, "w") as f:
            yaml.dump(cfg, f)
        records = []

        class _Cap(logging.Handler):
            def emit(self, record):
                records.append(record.getMessage())

        cap = _Cap()
        logging.getLogger("nl_vsgg_tpu").addHandler(cap)
        monkeypatch.setattr(sys, "argv", ["train_STTran.py", "--cfg", cfg_path])
        try:
            train.main()
        finally:
            logging.getLogger("nl_vsgg_tpu").removeHandler(cap)
        if name == "store":
            assert any("device entry store" in m and "gathered batches" in m
                       for m in records), "\n".join(records[-30:])
        ckpt = os.path.join(cfg["save_path"], "ckpt", "1")
        params[name] = ocp.StandardCheckpointer().restore(ckpt)
    a = jax.tree.leaves(params["stream"])
    b = jax.tree.leaves(params["store"])
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_device_entry_store_mesh_training(tmp_path, monkeypatch):
    """The store under a 4x2 mesh (VERDICT r4 #3): batches adopted from the
    sharded uploads (add_batch), warm epochs served by shard-local gathers —
    the CLI must log the sharded store and actually gather batches. (Exact
    value parity of sharded gathers vs place_entries is pinned in
    tests/test_device_store.py; batch COMPOSITION differs from the streamed
    run by design — shard-balanced planning — so trajectories are not
    compared here.)"""
    import logging

    ag = build_micro_ag(str(tmp_path), n_videos=8, n_frames=3, feat_dim=32)
    cfg = {"mode": "sgdet", "lr": 1e-4, "nepoch": 2, "enc_layer": 1,
           "dec_layer": 1, "feat_dim": 32, "bce_loss": True,
           "mesh": {"data": 4, "model": 2}, "device_entry_store_gb": 1.0,
           "batch_videos": 4, "num_workers": 1, "seed": 7, "data_path": ag,
           "pseudo_localized_SG_path": os.path.join(ag, "final_ag_data_w_neg.pkl"),
           "frame_features_path": os.path.join(ag, "frame_features"),
           "save_path": str(tmp_path / "out_mesh_store")}
    cfg_path = str(tmp_path / "cfg_mesh_store.yml")
    with open(cfg_path, "w") as f:
        yaml.dump(cfg, f)
    records = []

    class _Cap(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    cap = _Cap()
    logging.getLogger("nl_vsgg_tpu").addHandler(cap)
    train = _load_tool("train_STTran")
    monkeypatch.setattr(sys, "argv", ["train_STTran.py", "--cfg", cfg_path])
    try:
        train.main()
    finally:
        logging.getLogger("nl_vsgg_tpu").removeHandler(cap)
    assert any("device entry store sharded over data=4" in m
               for m in records), "\n".join(records[-30:])
    assert any("device entry store" in m and "gathered batches" in m
               and not m.startswith("device entry store: 0 ")
               for m in records), "\n".join(records[-30:])
    assert os.path.isdir(os.path.join(cfg["save_path"], "ckpt", "1"))


@pytest.mark.slow
def test_dsg_detr_train_cli(tmp_path, monkeypatch):
    ag = build_micro_ag(str(tmp_path), n_videos=2, n_frames=3, feat_dim=32)
    cfg = {"mode": "sgdet", "lr": 1e-4, "nepoch": 1, "feat_dim": 32,
           "bce_loss": True, "batch_videos": 2, "data_path": ag,
           "pseudo_localized_SG_path": os.path.join(ag, "final_ag_data_w_neg.pkl"),
           "frame_features_path": os.path.join(ag, "frame_features"),
           "save_path": str(tmp_path / "out_dsg")}
    cfg_path = str(tmp_path / "cfg_dsg.yml")
    with open(cfg_path, "w") as f:
        yaml.dump(cfg, f)
    _load_tool("train_STTran")
    _load_tool("test_STTran")
    dsg = _load_tool("train_DSG_DETR")
    monkeypatch.setattr(sys, "argv", ["train_DSG_DETR.py", "--cfg", cfg_path])
    dsg.main()
    assert os.path.isdir(os.path.join(cfg["save_path"], "ckpt", "0"))

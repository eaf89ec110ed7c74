"""tools/tune_buckets.py — bucket-ladder recommendation from a dataset scan,
plus the YAML `buckets:`/`mesh:` config parsing its output relies on."""

import os

import numpy as np
import pytest
import yaml

from tests.fixtures import build_micro_ag, load_tool


def test_optimal_buckets_dp_beats_doubling():
    tune = load_tool("tune_buckets")
    rng = np.random.default_rng(0)
    # bimodal distribution: most videos small, a heavy tail
    counts = np.concatenate([rng.integers(10, 40, 900),
                             rng.integers(200, 260, 100)])
    edges = tune.optimal_buckets(counts, k=4, alpha=256.0)
    assert edges == sorted(edges) and len(edges) <= 4
    assert edges[-1] >= counts.max()  # nothing truncated
    w_dp, t_dp = tune.waste(counts, edges, 256.0)
    w_pow, t_pow = tune.waste(counts, [32, 64, 128, 256], 256.0)
    assert t_dp == 0
    assert w_dp <= w_pow + 1e-9  # DP at least as good as the doubling ladder

    # degenerate: one unique value -> one tight bucket
    assert tune.optimal_buckets(np.full(10, 24), k=3) == [24]


def test_npy_rows_reads_header_only(tmp_path):
    tune = load_tool("tune_buckets")
    p = str(tmp_path / "feat.npy")
    np.save(p, np.zeros((37, 64), np.float32))
    assert tune.npy_rows(p) == 37


def test_cli_on_micro_ag(tmp_path, capsys):
    tune = load_tool("tune_buckets")
    ag = build_micro_ag(str(tmp_path), n_videos=4, n_frames=3, feat_dim=16)
    cfg = {"data_path": ag,
           "frame_features_path": os.path.join(ag, "frame_features")}
    cfg_path = str(tmp_path / "cfg.yml")
    with open(cfg_path, "w") as f:
        yaml.dump(cfg, f)
    bb, br = tune.main(["--cfg", cfg_path, "-k", "3"])
    out = capsys.readouterr().out
    assert "max_boxes:" in out and "# 4 videos:" in out
    # micro AG: 3 dets/frame x 3 frames = 9 boxes -> one aligned-up bucket.
    # The rel ladder is tuned on rels ~ boxes - frames (r4: the runtime
    # picks the rung from exact post-grounding counts with a JOINT rung
    # index, data/entry.py pick_joint_bucket, so rel edges are live)
    assert bb == [16] and br == [8]

    # the printed YAML round-trips through load_config
    from nl_vsgg_tpu.utils.config import load_config
    with open(cfg_path, "w") as f:
        yaml.dump(dict(cfg, buckets={"max_boxes": bb, "max_rels": br,
                                     "max_frames": [4, 8]}), f)
    c = load_config(cfg_path)
    assert c.buckets.max_boxes == (16,)
    assert c.buckets.max_rels == (8,)
    assert c.buckets.max_frames == (4, 8)


def test_yaml_mesh_and_bad_keys(tmp_path):
    from nl_vsgg_tpu.utils.config import load_config
    cfg_path = str(tmp_path / "cfg.yml")
    with open(cfg_path, "w") as f:
        yaml.dump({"mesh": {"data": -1, "model": 2}}, f)
    c = load_config(cfg_path)
    assert c.mesh.model == 2 and c.mesh.data == -1

    with open(cfg_path, "w") as f:
        yaml.dump({"buckets": {"max_boxen": [8]}}, f)
    with pytest.raises(ValueError, match="unknown buckets keys"):
        load_config(cfg_path)

"""Live union-feature wiring (tools/train_STTran.py::make_union_provider):
the shipped recipe runs with union_box_feature=true, so the CLI grounding path
must populate Entry.union_feat from the VinVL detector — and warn LOUDLY when
it cannot (round 1 zeroed silently)."""

import importlib.util
import os
import sys

import numpy as np
import pytest

from nl_vsgg_tpu.utils.config import load_config

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")


def _load_tool(name):
    spec = importlib.util.spec_from_file_location(name, os.path.join(TOOLS, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


class FakeLogger:
    def __init__(self):
        self.warnings, self.infos = [], []

    def warning(self, msg, *a):
        self.warnings.append(msg % a if a else msg)

    def info(self, msg, *a):
        self.infos.append(msg % a if a else msg)


def test_provider_none_when_flag_off():
    train = _load_tool("train_STTran")
    cfg = load_config(None, {"union_box_feature": False})
    log = FakeLogger()
    assert train.make_union_provider(cfg, log) is None
    assert log.warnings == []


def test_provider_warns_loudly_without_checkpoint():
    train = _load_tool("train_STTran")
    cfg = load_config(None, {"union_box_feature": True, "vinvl_ckpt": ""})
    log = FakeLogger()
    assert train.make_union_provider(cfg, log) is None
    assert len(log.warnings) == 1
    assert "ZEROS" in log.warnings[0] and "vinvl_ckpt" in log.warnings[0]


def test_provider_warns_on_missing_frames(tmp_path, rng):
    """Checkpoint present but frame images absent: per-video fallback to
    zeros, with a warning naming the frames root."""
    train = _load_tool("train_STTran")
    npz = _write_synth_vinvl_npz(str(tmp_path / "vinvl.npz"), rng)
    cfg = load_config(None, {"union_box_feature": True, "vinvl_ckpt": npz,
                             "frames_path": str(tmp_path / "no_frames")})
    log = FakeLogger()
    provider = train.make_union_provider(cfg, log)
    assert provider is not None

    class DS:
        video_list = [["vidX.mp4/000000.png"]]

    assert provider(DS(), 0) is None
    assert any("ZEROS" in w for w in log.warnings)


def _write_synth_vinvl_npz(path, rng):
    import jax

    from nl_vsgg_tpu.detector.convert import convert_state_dict
    from tests.fixtures import make_vinvl_state_dict

    variables = convert_state_dict(make_vinvl_state_dict(rng))
    flat = {"/".join(str(getattr(k, "key", k)) for k in p): np.asarray(leaf)
            for p, leaf in jax.tree_util.tree_leaves_with_path(variables)}
    np.savez(path, **flat)
    return path


@pytest.mark.slow
def test_ground_video_populates_union_feat(tmp_path, rng):
    """End-to-end: micro AG dataset + synthetic VinVL npz + frame images on
    disk -> ground_video returns an Entry whose union_feat is nonzero on
    valid relations and zero on padding."""
    cv2 = pytest.importorskip("cv2")

    from nl_vsgg_tpu.data.action_genome import AGTrain
    from tests.fixtures import build_micro_ag

    train = _load_tool("train_STTran")
    ag = build_micro_ag(str(tmp_path), n_videos=1, n_frames=2, feat_dim=2048)
    ds = AGTrain(ag, remove_one_frame_video=False)
    frames_root = os.path.join(ag, "frames")
    for f in ds.video_list[0]:
        p = os.path.join(frames_root, f)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        cv2.imwrite(p, rng.integers(0, 255, (64, 96, 3)).astype(np.uint8))

    npz = _write_synth_vinvl_npz(str(tmp_path / "vinvl.npz"), rng)
    cfg = load_config(None, {
        "union_box_feature": True, "vinvl_ckpt": npz, "data_path": ag,
        "frame_features_path": os.path.join(ag, "frame_features"),
        "feat_dim": 2048})
    log = FakeLogger()
    provider = train.make_union_provider(cfg, log)
    assert provider is not None
    e = train.ground_video(ds, 0, cfg, True, cfg.buckets, union_provider=provider)
    assert e is not None
    uf = np.asarray(e.union_feat)
    rm = np.asarray(e.rel_mask)
    assert uf.shape[-1] == 2048 and uf.shape[1:3] == (7, 7)
    assert float(np.abs(uf[rm]).max()) > 0, "union features still zero"
    assert float(np.abs(uf[~rm]).max()) == 0, "padding rows must stay zero"
    assert log.warnings == []


def test_union_feat_cache_roundtrip(tmp_path):
    """cfg.union_feat_cache: first grounding extracts and writes the cache;
    the second reads it back WITHOUT invoking the provider (no frame reads,
    no detector), reproducing the same Entry. float32 cache is exact;
    float16 (the default) is within fp16 rounding."""
    from nl_vsgg_tpu.data.action_genome import AGTrain
    from tests.fixtures import build_micro_ag

    train = _load_tool("train_STTran")
    ag = build_micro_ag(str(tmp_path), n_videos=1, n_frames=2, feat_dim=64)
    ds = AGTrain(ag, remove_one_frame_video=False)
    calls = []

    def provider(ds_, idx):
        calls.append(idx)
        r = np.random.default_rng(7)
        table = {}

        def fn(f, boxes):
            key = (f, len(boxes))
            if key not in table:  # deterministic per (frame, count)
                table[key] = r.standard_normal(
                    (len(boxes), 7, 7, 64)).astype(np.float32)
            return table[key]
        return fn

    for dtype, exact in (("float32", True), ("float16", False)):
        calls.clear()
        cfg = load_config(None, {
            "data_path": ag, "feat_dim": 64,
            "frame_features_path": os.path.join(ag, "frame_features"),
            "union_feat_cache": str(tmp_path / f"uf_cache_{dtype}"),
            "union_feat_cache_dtype": dtype})
        e1 = train.ground_video(ds, 0, cfg, True, cfg.buckets,
                                union_provider=provider)
        assert calls == [0] and e1 is not None
        assert float(np.abs(np.asarray(e1.union_feat)).max()) > 0
        e2 = train.ground_video(ds, 0, cfg, True, cfg.buckets,
                                union_provider=provider)
        assert calls == [0], "cache hit must not re-invoke the provider"
        a, b = np.asarray(e1.union_feat), np.asarray(e2.union_feat)
        if exact:
            np.testing.assert_array_equal(a, b)
        else:
            np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3)


def test_union_feat_cache_never_poisoned_by_fallback(tmp_path):
    """A failed provider (frames missing) must fall back to zeros WITHOUT
    writing the cache; once the provider works, the real features are
    extracted and cached. A stale-dtype or corrupt cache file re-extracts
    instead of being consumed or crashing."""
    from nl_vsgg_tpu.data.action_genome import AGTrain
    from tests.fixtures import build_micro_ag

    train = _load_tool("train_STTran")
    ag = build_micro_ag(str(tmp_path), n_videos=1, n_frames=2, feat_dim=64)
    ds = AGTrain(ag, remove_one_frame_video=False)
    cache = tmp_path / "uf_cache"
    cfg = load_config(None, {
        "data_path": ag, "feat_dim": 64,
        "frame_features_path": os.path.join(ag, "frame_features"),
        "union_feat_cache": str(cache)})

    broken = lambda ds_, idx: None  # provider fails (e.g. frames missing)
    e = train.ground_video(ds, 0, cfg, True, cfg.buckets,
                           union_provider=broken)
    assert e is not None
    assert float(np.abs(np.asarray(e.union_feat)).sum()) == 0
    assert not list(cache.rglob("*.npz")), "zeros fallback must not be cached"

    def good(ds_, idx):
        r = np.random.default_rng(3)
        return lambda f, boxes: r.standard_normal(
            (len(boxes), 7, 7, 64)).astype(np.float32)

    e2 = train.ground_video(ds, 0, cfg, True, cfg.buckets, union_provider=good)
    assert float(np.abs(np.asarray(e2.union_feat)).max()) > 0
    files = list(cache.rglob("*.npz"))
    assert len(files) == 1 and files[0].suffix == ".npz"
    with np.load(files[0]) as z:
        assert z["uf"].dtype == np.float16  # default storage dtype

    # dtype change -> stale cache, provider re-invoked (not silently consumed)
    calls = []

    def counting(ds_, idx):
        calls.append(idx)
        return good(ds_, idx)

    cfg32 = load_config(None, {
        "data_path": ag, "feat_dim": 64,
        "frame_features_path": os.path.join(ag, "frame_features"),
        "union_feat_cache": str(cache), "union_feat_cache_dtype": "float32"})
    train.ground_video(ds, 0, cfg32, True, cfg32.buckets,
                       union_provider=counting)
    assert calls == [0]
    with np.load(files[0]) as z:
        assert z["uf"].dtype == np.float32  # rewritten at fp32

    # corrupt file -> miss (re-extract), never a crash
    files[0].write_bytes(b"not an npy")
    calls.clear()
    e3 = train.ground_video(ds, 0, cfg32, True, cfg32.buckets,
                            union_provider=counting)
    assert calls == [0] and e3 is not None
    with np.load(files[0]) as z:
        assert z["uf"].dtype == np.float32  # repaired

    # provider-identity change (here: detector dtype) invalidates the
    # fingerprint -> re-extract, never silently serve the old features
    cfg_bf = load_config(None, {
        "data_path": ag, "feat_dim": 64,
        "frame_features_path": os.path.join(ag, "frame_features"),
        "union_feat_cache": str(cache), "union_feat_cache_dtype": "float32",
        "vinvl_dtype": "bfloat16"})
    calls.clear()
    train.ground_video(ds, 0, cfg_bf, True, cfg_bf.buckets,
                       union_provider=counting)
    assert calls == [0], "stale provider fingerprint must re-extract"


def test_cfg_dtype_reaches_models():
    """cfg.dtype='bfloat16' must flow into both model builders (params stay
    fp32; the compute dtype drives the MXU path)."""
    import jax.numpy as jnp

    from nl_vsgg_tpu.data import schema

    train = _load_tool("train_STTran")
    dsg = _load_tool("train_DSG_DETR")
    tax = schema.load_taxonomy()
    cfg = load_config(None, {"dtype": "bfloat16", "feat_dim": 64})
    assert train.build_model(cfg, tax).dtype == jnp.bfloat16
    assert dsg.build_model(cfg, tax).dtype == jnp.bfloat16
    cfg32 = load_config(None, {"feat_dim": 64})
    assert train.build_model(cfg32, tax).dtype is None

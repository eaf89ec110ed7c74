"""Packed-Entry disk cache (data/entry_cache.py + ground_video wiring).

Grounding is deterministic per video, so the finished padded Entry is
reusable across epochs — the reference re-runs the whole host pipeline every
step (/root/reference/lib/assign_pseudo_label.py:27-45). These tests pin:
exact round-trip of every Entry field (incl. width-0 sentinels and the
scalar num_frames), the None tombstone, key invalidation, truncation-count
replay, torn-file recovery, and that a ground_video cache hit never re-runs
the grounding engine.
"""

import dataclasses
import os

import numpy as np
import pytest

from nl_vsgg_tpu.data.action_genome import AGTrain
from nl_vsgg_tpu.data.entry import Entry, empty_entry
from nl_vsgg_tpu.data.entry_cache import MISS, EntryCache, entry_cache_key
from nl_vsgg_tpu.utils.config import load_config
from tests.fixtures import build_micro_ag, load_tool


@pytest.fixture(scope="module")
def train_mod():
    return load_tool("train_STTran")


def _rand_entry(rng, n_boxes=8, n_rels=6, feat_dim=16, union_width=True,
                mask_width=False):
    e = empty_entry(n_boxes, n_rels, feat_dim=feat_dim,
                    with_union_feat=union_width,
                    with_spatial_masks=mask_width)
    kw = {}
    for f in dataclasses.fields(Entry):
        v = np.asarray(getattr(e, f.name))
        if f.name == "num_frames":
            kw[f.name] = np.int32(5)
        elif v.dtype == bool:
            kw[f.name] = rng.random(v.shape) > 0.5
        elif v.dtype == np.int32:
            kw[f.name] = rng.integers(0, 7, v.shape).astype(np.int32)
        else:
            kw[f.name] = rng.standard_normal(v.shape).astype(v.dtype)
    return Entry(**kw)


def test_roundtrip_exact_all_fields(tmp_path, rng):
    cache = EntryCache(str(tmp_path), "train", "k1", union_dtype="float32")
    e = _rand_entry(rng)
    cache.store("v/1.mp4", e, trunc=(3, 7))
    got, tr = cache.load("v/1.mp4")
    assert tr == (3, 7)
    for f in dataclasses.fields(Entry):
        a, b = np.asarray(getattr(e, f.name)), np.asarray(getattr(got, f.name))
        assert a.dtype == b.dtype, f.name
        np.testing.assert_array_equal(a, b, err_msg=f.name)
    assert np.asarray(got.num_frames).shape == ()


def test_width0_sentinels_survive(tmp_path, rng):
    """The width-0 union_feat / spatial_masks sentinels (entry.py field
    comments) must round-trip as width-0 — a cache that rehydrated them to
    full width would silently disable the device-side rasterization path."""
    cache = EntryCache(str(tmp_path), "train", "k1")
    e = _rand_entry(rng, union_width=False, mask_width=False)
    cache.store("v", e)
    got, _ = cache.load("v")
    assert np.asarray(got.union_feat).shape[-1] == 0
    assert np.asarray(got.spatial_masks).shape[-1] == 0


def test_union_f16_storage(tmp_path, rng):
    cache = EntryCache(str(tmp_path), "train", "k1", union_dtype="float16")
    e = _rand_entry(rng, union_width=True)
    cache.store("v", e)
    got, _ = cache.load("v")
    uf = np.asarray(got.union_feat)
    assert uf.dtype == np.float32  # cast back on load
    np.testing.assert_allclose(uf, np.asarray(e.union_feat),
                               rtol=1e-3, atol=1e-3)
    # every other field stays exact
    np.testing.assert_array_equal(np.asarray(got.features),
                                  np.asarray(e.features))


def test_zero_union_stored_as_marker(tmp_path, rng):
    """No-provider grounding yields a dense ALL-ZERO union block at bucket
    shape (grounding.py:_resolve_union_features no-provider branch); storing
    it verbatim costs ~19 MB/video and dominated warm-epoch loads (round-4
    train_e2e finding). It must round-trip via a shape marker: tiny file,
    exact zeros + shape + fp32 dtype back."""
    cache = EntryCache(str(tmp_path), "train", "k1", union_dtype="float16")
    e = _rand_entry(rng, n_rels=16, feat_dim=256, union_width=True)
    e = e.replace(union_feat=np.zeros_like(np.asarray(e.union_feat)))
    cache.store("v", e)
    assert os.path.getsize(cache.path("v")) < 1_000_000  # marker, not zeros
    got, _ = cache.load("v")
    uf = np.asarray(got.union_feat)
    assert uf.shape == np.asarray(e.union_feat).shape
    assert uf.dtype == np.float32
    assert not uf.any()
    # nonzero unions still store data (fp16) — the marker is zeros-only
    e2 = _rand_entry(rng, n_rels=16, feat_dim=256, union_width=True)
    cache.store("v2", e2)
    got2, _ = cache.load("v2")
    np.testing.assert_allclose(np.asarray(got2.union_feat),
                               np.asarray(e2.union_feat), rtol=1e-3, atol=1e-3)


def test_none_tombstone(tmp_path):
    cache = EntryCache(str(tmp_path), "train", "k1")
    cache.store("empty_vid", None)
    got = cache.load("empty_vid")
    assert got == (None, (0, 0))
    assert cache.load("never_stored") is MISS


def test_key_mismatch_is_miss(tmp_path, rng):
    a = EntryCache(str(tmp_path), "train", "pseudo@100")
    e = _rand_entry(rng)
    a.store("v", e)
    assert a.load("v") is not MISS
    b = EntryCache(str(tmp_path), "train", "pseudo@200")  # labels changed
    assert b.load("v") is MISS
    # and storing under the new key replaces the stale file
    b.store("v", None)
    assert b.load("v") == (None, (0, 0)) and a.load("v") is MISS


def test_torn_file_is_miss(tmp_path):
    cache = EntryCache(str(tmp_path), "train", "k")
    cache.store("v", None)
    with open(cache.path("v"), "wb") as f:
        f.write(b"\x00garbage")
    assert cache.load("v") is MISS


def test_ground_video_cache_hit_skips_grounding(tmp_path, train_mod):
    ag = build_micro_ag(str(tmp_path), n_videos=2, n_frames=3, feat_dim=64)
    ds = AGTrain(ag, remove_one_frame_video=False)
    cfg = load_config(None, {
        "data_path": ag, "feat_dim": 64,
        "frame_features_path": os.path.join(ag, "frame_features"),
        "entry_cache": str(tmp_path / "ecache")})
    e1 = train_mod.ground_video(ds, 0, cfg, True, cfg.buckets)
    assert e1 is not None
    # second call must be served from disk: make the uncached path explode
    orig = train_mod._ground_video_uncached
    train_mod._ground_video_uncached = lambda *a, **k: (_ for _ in ()).throw(
        AssertionError("cache hit must not re-ground"))
    try:
        # fresh dataset object (fresh run): the cache persists across runs
        ds2 = AGTrain(ag, remove_one_frame_video=False)
        e2 = train_mod.ground_video(ds2, 0, cfg, True, cfg.buckets)
    finally:
        train_mod._ground_video_uncached = orig
    for f in dataclasses.fields(Entry):
        np.testing.assert_array_equal(np.asarray(getattr(e1, f.name)),
                                      np.asarray(getattr(e2, f.name)),
                                      err_msg=f.name)


def test_ground_video_trunc_replay(tmp_path, train_mod):
    """A cache hit must replay the truncation counts into on_truncate or the
    per-epoch 'labels dropped' warning goes silent on warm epochs."""
    ag = build_micro_ag(str(tmp_path), n_videos=1, n_frames=4, feat_dim=32,
                        n_objs=3)
    ds = AGTrain(ag, remove_one_frame_video=False)
    # a 4-box bucket truncates (4 frames x (person + 3 objs) = 16 boxes)
    cfg = load_config(None, {
        "data_path": ag, "feat_dim": 32,
        "frame_features_path": os.path.join(ag, "frame_features"),
        "entry_cache": str(tmp_path / "ecache"),
        "buckets": {"max_frames": [8], "max_boxes": [4], "max_rels": [4]}})
    cold, warm = [], []
    e1 = train_mod.ground_video(ds, 0, cfg, True, cfg.buckets,
                                on_truncate=lambda b, r: cold.append((b, r)))
    assert e1 is not None and cold, "fixture must actually truncate"
    ds2 = AGTrain(ag, remove_one_frame_video=False)
    train_mod.ground_video(ds2, 0, cfg, True, cfg.buckets,
                           on_truncate=lambda b, r: warm.append((b, r)))
    assert warm == cold


def test_entry_cache_key_components(tmp_path):
    ag = build_micro_ag(str(tmp_path), n_videos=1, n_frames=2, feat_dim=32)
    base = load_config(None, {
        "data_path": ag, "feat_dim": 32,
        "pseudo_localized_SG_path": os.path.join(ag, "final_ag_data_w_neg.pkl"),
        "frame_features_path": os.path.join(ag, "frame_features")})
    k0 = entry_cache_key(base, True, "")
    # every grounding-relevant knob must move the key
    assert entry_cache_key(base.replace(pseudo_way=1), True, "") != k0
    assert entry_cache_key(base.replace(device_spatial_masks=False),
                           True, "") != k0
    assert entry_cache_key(base, True, "ckpt:123:bfloat16") != k0
    assert entry_cache_key(base, False, "") != k0  # split
    # touching the pseudo-label pickle invalidates train entries
    pl = base.pseudo_localized_SG_path
    os.utime(pl, (os.path.getmtime(pl) + 10, os.path.getmtime(pl) + 10))
    assert entry_cache_key(base, True, "") != k0

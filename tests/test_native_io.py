"""Native C++ IO library tests: .npy parser/parallel reader vs np.load,
padded packer vs numpy reference, and fallback behavior."""

import os

import numpy as np
import pytest

from nl_vsgg_tpu.utils import native_io


@pytest.fixture(scope="module")
def lib():
    lib = native_io.get_lib()
    if lib is None:
        pytest.skip("g++ unavailable; native path untestable")
    return lib


def test_read_feat_batch_matches_numpy(tmp_path, rng, lib):
    paths, refs = [], []
    for i in range(7):
        a = rng.standard_normal((int(rng.integers(1, 30)), 64)).astype(np.float32)
        p = str(tmp_path / f"f{i}.npy")
        np.save(p, a)
        paths.append(p)
        refs.append(a)
    out, counts = native_io.read_feat_batch(paths, 64, max_rows_each=32)
    assert out.shape == (7, 32, 64)
    for i, a in enumerate(refs):
        assert counts[i] == len(a)
        np.testing.assert_array_equal(out[i, :len(a)], a)
        assert (out[i, len(a):] == 0).all()


def test_read_truncates_at_max_rows(tmp_path, rng, lib):
    a = rng.standard_normal((50, 8)).astype(np.float32)
    p = str(tmp_path / "big.npy")
    np.save(p, a)
    out, counts = native_io.read_feat_batch([p], 8, max_rows_each=10)
    assert counts[0] == 10
    np.testing.assert_array_equal(out[0], a[:10])


def test_read_missing_file_raises(tmp_path, lib):
    with pytest.raises(IOError):
        native_io.read_feat_batch([str(tmp_path / "nope.npy")], 8, 4)


def test_pack_padded_matches_numpy(rng, lib):
    counts = np.array([3, 0, 7, 2])
    src = rng.standard_normal((int(counts.sum()), 16)).astype(np.float32)
    out = native_io.pack_padded(src, counts, bucket_rows=5)
    off = 0
    for s, c in enumerate(counts):
        keep = min(int(c), 5)
        np.testing.assert_array_equal(out[s, :keep], src[off:off + keep])
        assert (out[s, keep:] == 0).all()
        off += int(c)


def test_fallback_without_native(tmp_path, rng, monkeypatch):
    monkeypatch.setattr(native_io, "get_lib", lambda: None)
    a = rng.standard_normal((5, 4)).astype(np.float32)
    p = str(tmp_path / "x.npy")
    np.save(p, a)
    out, counts = native_io.read_feat_batch([p], 4, 8)
    assert counts[0] == 5
    np.testing.assert_array_equal(out[0, :5], a)


def test_dets_sidecar_fast_path_matches_pickle(tmp_path, rng, lib):
    """load_frame_features with dets_f32.npy sidecars (fully native) returns
    exactly what the pickle path returns."""
    import os

    from nl_vsgg_tpu.data.grounding import (DETS_F32, dets_to_f32,
                                            load_frame_features)

    paths = []
    for f in range(3):
        d = tmp_path / f"fr{f}"
        d.mkdir()
        n = int(rng.integers(1, 6))
        dets = [{"class": int(rng.integers(0, 1595)),
                 "conf": np.float32(rng.uniform(0.1, 1.0)),
                 "rect": rng.uniform(0, 400, 4).astype(np.float32)}
                for _ in range(n)]
        np.save(d / "dets.npy", np.asarray(dets, object), allow_pickle=True)
        np.save(d / DETS_F32, dets_to_f32(dets))
        np.save(d / "feat.npy", rng.standard_normal((n, 32)).astype(np.float32))
        paths.append(str(d))

    fast = load_frame_features(paths, use_native=True, feat_dim=32)
    slow = load_frame_features(paths, use_native=False, feat_dim=32)
    for a, b in zip(fast, slow):
        np.testing.assert_array_equal(a.classes, b.classes)
        np.testing.assert_allclose(a.confs, b.confs, rtol=1e-6)
        np.testing.assert_allclose(a.rects, b.rects, rtol=1e-6)
        np.testing.assert_allclose(a.feats, b.feats)

    # missing sidecar on one frame -> pickle path, same results
    os.remove(os.path.join(paths[1], DETS_F32))
    mixed = load_frame_features(paths, use_native=True, feat_dim=32)
    for a, b in zip(mixed, slow):
        np.testing.assert_array_equal(a.classes, b.classes)
        np.testing.assert_allclose(a.feats, b.feats)

"""Parity of the MXU (matmul) and Pallas RoIAlign variants against the
golden-tested gather implementation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nl_vsgg_tpu.ops.roi_align import roi_align
from nl_vsgg_tpu.ops.roi_align_mm import roi_align_mm, roi_align_mm_frames


def _case(rng, H=11, W=13, C=8, R=9):
    fmap = rng.standard_normal((H, W, C)).astype(np.float32)
    rois = []
    for _ in range(R):
        x = np.sort(rng.uniform(-20, W * 16 + 20, 2))
        y = np.sort(rng.uniform(-20, H * 16 + 20, 2))
        rois.append([x[0], y[0], x[1] + 1, y[1] + 1])
    return jnp.asarray(fmap), jnp.asarray(np.asarray(rois, np.float32))


class TestMatmulRoIAlign:
    def test_matches_gather(self, rng):
        fmap, rois = _case(rng)
        ref = roi_align(fmap, rois)
        mm = roi_align_mm(fmap, rois)
        np.testing.assert_allclose(np.asarray(mm), np.asarray(ref), atol=1e-4)

    def test_frames_variant(self, rng):
        fmaps = jnp.asarray(rng.standard_normal((3, 9, 10, 4)).astype(np.float32))
        rois = jnp.asarray(rng.uniform(0, 100, (6, 4)).astype(np.float32))
        rois = jnp.concatenate([jnp.minimum(rois[:, :2], rois[:, 2:]),
                                jnp.maximum(rois[:, :2], rois[:, 2:]) + 8], 1)
        fidx = jnp.asarray([0, 1, 2, 0, 1, 2])
        mm = roi_align_mm_frames(fmaps, rois, fidx)
        for i in range(6):
            ref = roi_align(fmaps[int(fidx[i])], rois[i:i + 1])
            np.testing.assert_allclose(np.asarray(mm[i]), np.asarray(ref[0]),
                                       atol=1e-4)

    def test_degenerate_and_out_of_range_rois(self, rng):
        fmap = jnp.asarray(rng.standard_normal((8, 8, 4)).astype(np.float32))
        rois = jnp.asarray([[0, 0, 0, 0],            # zero-size -> clamped 1x1
                            [-500, -500, -400, -400],  # fully outside -> 0
                            [0, 0, 127, 127]], jnp.float32)
        ref = roi_align(fmap, rois)
        mm = roi_align_mm(fmap, rois)
        np.testing.assert_allclose(np.asarray(mm), np.asarray(ref), atol=1e-4)
        assert np.abs(np.asarray(mm[1])).max() == 0.0


class TestPallasRoIAlign:
    def test_matches_gather(self, rng):
        if jax.default_backend() not in ("tpu", "axon"):
            pytest.skip("pallas TPU kernel needs a TPU backend")
        from nl_vsgg_tpu.ops.pallas_roi_align import roi_align_pallas
        fmap, rois = _case(rng, H=12, W=16, C=256, R=5)
        ref = roi_align(fmap, rois)
        pk = roi_align_pallas(fmap, rois)
        np.testing.assert_allclose(np.asarray(pk), np.asarray(ref), atol=1e-3)


class TestPallasTiledRoIAlign:
    def test_matches_gather_interpret(self, rng):
        """CPU parity via the Pallas interpreter (the compiled kernel's chip
        parity vs mm is 2.4e-7 on real shapes, measured on TPU v5e)."""
        from nl_vsgg_tpu.ops.pallas_roi_align import roi_align_pallas_tiled
        fmap, rois = _case(rng, H=12, W=16, C=256, R=11)  # R % 8 != 0: pads
        ref = roi_align(fmap, rois)
        got = roi_align_pallas_tiled(fmap, rois, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)

    def test_output_size_14(self, rng):
        from nl_vsgg_tpu.ops.pallas_roi_align import roi_align_pallas_tiled
        fmap, rois = _case(rng, H=10, W=12, C=128, R=8)
        ref = roi_align(fmap, rois, output_size=(14, 14))
        got = roi_align_pallas_tiled(fmap, rois, output_size=(14, 14),
                                     interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)

"""VinVL-JAX detector tests: block numerics vs torch mirrors of the maskrcnn
building blocks, box decoding, converter structure round-trip, and the full
detect() pipeline smoke on random weights."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nl_vsgg_tpu.detector.anchors import generate_base_anchors, grid_anchors
from nl_vsgg_tpu.detector.attr_rcnn import AttrRCNNJax, AttrRCNNModule, compute_scale
from nl_vsgg_tpu.detector.convert import convert_state_dict, _fold_bn
from nl_vsgg_tpu.detector.resnet import Bottleneck, Stage
from nl_vsgg_tpu.detector.rpn import decode_boxes, select_proposals

torch = pytest.importorskip("torch")


class TorchFrozenBN(torch.nn.Module):
    """maskrcnn FrozenBatchNorm2d (eps=0 form)."""

    def __init__(self, n):
        super().__init__()
        self.register_buffer("weight", torch.rand(n) + 0.5)
        self.register_buffer("bias", torch.randn(n) * 0.1)
        self.register_buffer("running_mean", torch.randn(n) * 0.1)
        self.register_buffer("running_var", torch.rand(n) + 0.5)

    def forward(self, x):
        scale = self.weight * self.running_var.rsqrt()
        bias = self.bias - self.running_mean * scale
        return x * scale.reshape(1, -1, 1, 1) + bias.reshape(1, -1, 1, 1)


class TorchBottleneck(torch.nn.Module):
    """maskrcnn BottleneckWithFixedBatchNorm, STRIDE_IN_1X1=False."""

    def __init__(self, cin, mid, cout, stride, groups, downsample):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(cin, mid, 1, 1, bias=False)
        self.bn1 = TorchFrozenBN(mid)
        self.conv2 = torch.nn.Conv2d(mid, mid, 3, stride, 1, groups=groups, bias=False)
        self.bn2 = TorchFrozenBN(mid)
        self.conv3 = torch.nn.Conv2d(mid, cout, 1, 1, bias=False)
        self.bn3 = TorchFrozenBN(cout)
        self.downsample = None
        if downsample:
            self.downsample = torch.nn.Sequential(
                torch.nn.Conv2d(cin, cout, 1, stride, bias=False),
                TorchFrozenBN(cout))

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        h = torch.relu(self.bn1(self.conv1(x)))
        h = torch.relu(self.bn2(self.conv2(h)))
        h = self.bn3(self.conv3(h))
        return torch.relu(h + idn)


def _convert_block(tb):
    sd = {k: v.detach().numpy() for k, v in tb.state_dict().items()}
    conv = lambda k: {"kernel": sd[k + ".weight"].transpose(2, 3, 1, 0)}
    p = {"conv1": conv("conv1"), "bn1": _fold_bn(sd, "bn1"),
         "conv2": conv("conv2"), "bn2": _fold_bn(sd, "bn2"),
         "conv3": conv("conv3"), "bn3": _fold_bn(sd, "bn3")}
    if tb.downsample is not None:
        p["downsample_conv"] = conv("downsample.0")
        p["downsample_bn"] = _fold_bn(sd, "downsample.1")
    return p


class TestBottleneckParity:
    @pytest.mark.parametrize("stride,downsample", [(1, False), (2, True)])
    def test_grouped_bottleneck(self, rng, stride, downsample):
        torch.manual_seed(3)
        cin, mid, cout, groups = 32, 16, 32, 8
        tb = TorchBottleneck(cin, mid, cout, stride, groups, downsample).eval()
        x = rng.standard_normal((1, cin, 12, 12)).astype(np.float32)
        with torch.no_grad():
            ref = tb(torch.as_tensor(x)).numpy()
        blk = Bottleneck(mid, cout, stride=stride, groups=groups,
                         has_downsample=downsample)
        ours = blk.apply({"params": _convert_block(tb)},
                         jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.moveaxis(np.asarray(ours), -1, 1), ref,
                                   atol=2e-5)


class TestAnchorsAndDecode:
    def test_base_anchors_shape_and_area(self):
        a = generate_base_anchors()
        assert a.shape == (15, 4)
        # each size group preserves ~size^2 area at ratio 1
        ratio1 = a[5:10]  # ratio 1.0 block: second ratio row scaled
        ws = ratio1[:, 2] - ratio1[:, 0] + 1
        np.testing.assert_allclose(ws, [32, 64, 128, 256, 512], rtol=0.01)

    def test_grid_layout(self):
        g = grid_anchors(2, 3, 16)
        assert g.shape == (2 * 3 * 15, 4)
        # anchor index fastest: first 15 share the (0,0) shift
        np.testing.assert_allclose(g[:15], generate_base_anchors())
        # next 15 shifted by stride in x
        np.testing.assert_allclose(g[15:30, 0] - g[:15, 0], 16.0)

    def test_decode_identity(self):
        anchors = jnp.asarray([[10.0, 20.0, 49.0, 59.0]])
        out = decode_boxes(anchors, jnp.zeros((1, 4)))
        np.testing.assert_allclose(np.asarray(out), [[10, 20, 49, 59]], atol=1e-5)

    def test_decode_shift(self):
        anchors = jnp.asarray([[0.0, 0.0, 39.0, 39.0]])  # w = h = 40
        out = decode_boxes(anchors, jnp.asarray([[0.25, 0.0, 0.0, 0.0]]))
        np.testing.assert_allclose(np.asarray(out), [[10, 0, 49, 39]], atol=1e-4)

    def test_compute_scale(self):
        assert compute_scale(480, 640) == 600 / 480
        # capped by max_size
        assert compute_scale(300, 1000) == pytest.approx(round(1000 * 300 / 1000) / 300)
        assert compute_scale(600, 800) == 1.0

    def test_resize_hw_truncates_like_maskrcnn(self):
        # Resize.get_size computes the non-min dimension with int(size*h/w)
        # (TRUNCATION, dataloader/transforms.py:102-105): 500x333 -> 900x600,
        # not round(500*600/333)=901
        from nl_vsgg_tpu.detector.attr_rcnn import resize_hw
        assert resize_hw(500, 333) == (900, 600)
        assert resize_hw(333, 500) == (600, 900)
        assert resize_hw(600, 800) == (600, 800)   # min side already == size
        # capped: size = int(round(1000*300/1000)) = 300 == min -> unchanged
        assert resize_hw(300, 1000) == (300, 1000)

    def test_video_bucket_covers_mixed_aspect_frames(self):
        # deriving the bucket from compute_scale(max_h, max_w) under-bounds
        # mixed aspect ratios and overflowed preprocess's slice write
        from nl_vsgg_tpu.detector.attr_rcnn import (preprocess,
                                                    video_bucket_hw)
        frames = [np.zeros((500, 1000, 3), np.uint8),
                  np.zeros((800, 600, 3), np.uint8)]
        hw = video_bucket_hw(frames)
        for img in frames:
            p, sc, (nh, nw) = preprocess(img, bucket_hw=hw)  # must not raise
            assert p.shape[:2] == hw and nh <= hw[0] and nw <= hw[1]
            h, w = img.shape[:2]
            np.testing.assert_allclose(sc, [nw / w, nh / h, nw / w, nh / h])


class TestProposals:
    def test_select_proposals_orders_and_nms(self, rng):
        anchors = jnp.asarray(rng.uniform(0, 200, (50, 4)).astype(np.float32))
        anchors = jnp.concatenate([jnp.minimum(anchors[:, :2], anchors[:, 2:]),
                                   jnp.maximum(anchors[:, :2], anchors[:, 2:]) + 10], 1)
        obj = jnp.asarray(rng.standard_normal(50).astype(np.float32))
        deltas = jnp.zeros((50, 4))
        boxes, valid = select_proposals(anchors, obj, deltas,
                                        jnp.asarray([240.0, 240.0]),
                                        pre_nms_top_n=50, post_nms_top_n=20)
        assert boxes.shape == (20, 4)
        assert bool(valid[0])
        # proposals are clipped to the image
        b = np.asarray(boxes)[np.asarray(valid)]
        assert (b >= 0).all() and (b <= 239).all()


class TestConverterAndPipeline:
    def _tiny_state_dict(self, rng):
        """Synthetic maskrcnn-style state dict with the real model's names."""
        from tests.fixtures import make_vinvl_state_dict
        return make_vinvl_state_dict(rng)

    @pytest.mark.slow
    def test_convert_structure_matches_init_and_detect_runs(self, rng):
        sd = self._tiny_state_dict(rng)
        variables = convert_state_dict(sd)
        det = AttrRCNNJax(variables, max_proposals=50, max_dets=20)
        # structure must match a fresh init exactly
        ref = AttrRCNNJax.create().variables
        ref_paths = {jax.tree_util.keystr(p) for p, _ in
                     jax.tree_util.tree_leaves_with_path(ref["params"])}
        got_paths = {jax.tree_util.keystr(p) for p, _ in
                     jax.tree_util.tree_leaves_with_path(variables["params"])}
        assert ref_paths == got_paths
        img = (rng.uniform(0, 255, (96, 128, 3))).astype(np.uint8)
        out = det.detect(img)
        assert out["boxes"].shape == (20, 4)
        assert out["features"].shape == (20, 2048)
        assert np.isfinite(out["features"]).all()
        feats = det.extract_box_features(img, np.array([[5, 5, 60, 60]], np.float32))
        assert feats.shape == (1, 7, 7, 2048)
        assert np.isfinite(feats).all()


class TestComputeDtype:
    @pytest.mark.slow
    def test_bf16_facade_tracks_fp32(self, rng):
        """compute_dtype='bfloat16' (the opt-in fast extraction mode) must
        produce features/boxes close to the fp32 pipeline on shared weights."""
        det32 = AttrRCNNJax.create(max_proposals=50, max_dets=20)
        det16 = AttrRCNNJax(det32.variables, max_proposals=50, max_dets=20,
                            compute_dtype="bfloat16")
        img = rng.uniform(0, 255, (96, 128, 3)).astype(np.uint8)
        boxes = np.array([[5, 5, 60, 60], [20, 10, 110, 80]], np.float32)
        f32 = np.asarray(det32.extract_box_features(img, boxes)).ravel()
        f16 = np.asarray(det16.extract_box_features(img, boxes)).ravel()
        assert np.isfinite(f16).all()
        corr = np.corrcoef(f32, f16)[0, 1]
        assert corr > 0.995, f"bf16 features decorrelated: corr={corr}"
        s32, s16 = np.abs(f32).mean(), np.abs(f16).mean()
        assert 0.9 < s16 / max(s32, 1e-9) < 1.1
        d32, d16 = det32.detect(img), det16.detect(img)
        assert d16["boxes"].shape == d32["boxes"].shape
        assert np.isfinite(d16["features"]).all()
        # both construction paths must arm the C5 bf16 stage (create() once
        # dropped compute_dtype from the module it pre-builds)
        import jax.numpy as jnp
        det_c = AttrRCNNJax.create(compute_dtype="bfloat16")
        assert det_c.module.compute_dtype == jnp.bfloat16
        assert det16.module.compute_dtype == jnp.bfloat16


class TestGroupPacking:
    """pack_grouped_kernel's block-diagonal expansion must compute the
    IDENTICAL convolution at feature_group_count=eff (the extra multiplies
    hit stored zeros; adding 0.0 terms is exact in IEEE)."""

    @pytest.mark.parametrize("eff", [1, 2, 4, 8])
    def test_packed_equals_grouped(self, eff):
        from jax import lax

        from nl_vsgg_tpu.detector.resnet import pack_grouped_kernel

        rng = np.random.default_rng(0)
        G, C, N, H, W = 8, 32, 2, 6, 5
        x = jnp.asarray(rng.standard_normal((N, H, W, C)).astype(np.float32))
        w = rng.standard_normal((3, 3, C // G, C)).astype(np.float32)

        def conv(w, gp):
            return lax.conv_general_dilated(
                x, jnp.asarray(w), window_strides=(1, 1),
                padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=gp)

        ref = conv(w, G)
        packed = conv(pack_grouped_kernel(w, G, eff), eff)
        # the added terms are exact zeros; only the compiled summation ORDER
        # of the nonzero terms differs between the two convolutions
        np.testing.assert_allclose(np.asarray(packed), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)

"""Golden tests for the geometry/kernel layer against independent numpy
oracles of the reference kernels' mathematical specs (SURVEY.md §4)."""

import numpy as np
import pytest

from nl_vsgg_tpu.ops import (batched_nms_mask, center_size, draw_union_boxes,
                             generalized_iou, intersection_ratio, iou,
                             nms_mask, roi_align, union_boxes)


# ---------- numpy oracles (scalar loop form, straight from the math) ----------

def iou_oracle(a, b, plus_one):
    off = 1.0 if plus_one else 0.0
    out = np.zeros((len(a), len(b)))
    for i, p in enumerate(a):
        for j, q in enumerate(b):
            iw = min(p[2], q[2]) - max(p[0], q[0]) + off
            ih = min(p[3], q[3]) - max(p[1], q[1]) + off
            if iw > 0 and ih > 0:
                ua = ((p[2] - p[0] + off) * (p[3] - p[1] + off)
                      + (q[2] - q[0] + off) * (q[3] - q[1] + off) - iw * ih)
                out[i, j] = iw * ih / ua
    return out


def giou_oracle(a, b):
    out = np.zeros((len(a), len(b)))
    for i, p in enumerate(a):
        for j, q in enumerate(b):
            iw = max(0.0, min(p[2], q[2]) - max(p[0], q[0]))
            ih = max(0.0, min(p[3], q[3]) - max(p[1], q[1]))
            inter = iw * ih
            union = ((p[2] - p[0]) * (p[3] - p[1])
                     + (q[2] - q[0]) * (q[3] - q[1]) - inter)
            hull = ((max(p[2], q[2]) - min(p[0], q[0]))
                    * (max(p[3], q[3]) - min(p[1], q[1])))
            out[i, j] = inter / union - (hull - union) / hull
    return out


def union_mask_oracle(pairs, P):
    """Spec of draw_rectangles.pyx:45-66: separable clip-ramp rasterization."""
    n = len(pairs)
    out = np.zeros((n, 2, P, P), dtype=np.float32)
    mm = lambda v: min(max(v, 0.0), 1.0)
    for r in range(n):
        x1u = min(pairs[r, 0], pairs[r, 4]); y1u = min(pairs[r, 1], pairs[r, 5])
        x2u = max(pairs[r, 2], pairs[r, 6]); y2u = max(pairs[r, 3], pairs[r, 7])
        w, h = x2u - x1u, y2u - y1u
        for c in range(2):
            bx1 = (pairs[r, 4 * c] - x1u) * P / w
            by1 = (pairs[r, 4 * c + 1] - y1u) * P / h
            bx2 = (pairs[r, 4 * c + 2] - x1u) * P / w
            by2 = (pairs[r, 4 * c + 3] - y1u) * P / h
            for j in range(P):
                yc = mm(j + 1 - by1) * mm(by2 - j)
                for k in range(P):
                    out[r, c, j, k] = mm(k + 1 - bx1) * mm(bx2 - k) * yc
    return out


def nms_oracle(boxes, scores, thresh):
    """Greedy +1-convention NMS (spec of lib/track.py:13-40 / nms.cu)."""
    order = np.argsort(-scores, kind="stable")
    keep = np.zeros(len(boxes), dtype=bool)
    suppressed = np.zeros(len(boxes), dtype=bool)
    for i in order:
        if suppressed[i]:
            continue
        keep[i] = True
        for j in order:
            if j == i or suppressed[j] or keep[j]:
                continue
            ov = iou_oracle(boxes[i:i + 1], boxes[j:j + 1], plus_one=True)[0, 0]
            if ov > thresh:
                suppressed[j] = True
    return keep


def roi_align_oracle(fmap, rois, out_size, scale, sr):
    """Bilinear RoIAlign, aligned=False semantics, fixed sampling grid."""
    H, W, C = fmap.shape
    ph, pw = out_size
    out = np.zeros((len(rois), ph, pw, C), dtype=np.float64)

    def bilinear(y, x):
        if y < -1.0 or y > H or x < -1.0 or x > W:
            return np.zeros(C)
        y = min(max(y, 0.0), H - 1)
        x = min(max(x, 0.0), W - 1)
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        y0, x0 = min(y0, H - 1), min(x0, W - 1)
        y1, x1 = min(y0 + 1, H - 1), min(x0 + 1, W - 1)
        ly, lx = y - y0, x - x0
        return (fmap[y0, x0] * (1 - ly) * (1 - lx) + fmap[y0, x1] * (1 - ly) * lx
                + fmap[y1, x0] * ly * (1 - lx) + fmap[y1, x1] * ly * lx)

    for r, roi in enumerate(rois):
        sx1, sy1, sx2, sy2 = roi * scale
        rw, rh = max(sx2 - sx1, 1.0), max(sy2 - sy1, 1.0)
        bw, bh = rw / pw, rh / ph
        for py in range(ph):
            for px in range(pw):
                acc = np.zeros(C)
                for a in range(sr):
                    for b in range(sr):
                        y = sy1 + (py + (a + 0.5) / sr) * bh
                        x = sx1 + (px + (b + 0.5) / sr) * bw
                        acc += bilinear(y, x)
                out[r, py, px] = acc / (sr * sr)
    return out


def rand_boxes(rng, n, size=400.0):
    xy = rng.uniform(0, size, (n, 2))
    wh = rng.uniform(5, size / 2, (n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


# ------------------------------- tests ----------------------------------


@pytest.mark.parametrize("plus_one", [False, True])
def test_iou(rng, plus_one):
    a, b = rand_boxes(rng, 13), rand_boxes(rng, 7)
    got = np.asarray(iou(a, b, plus_one=plus_one))
    np.testing.assert_allclose(got, iou_oracle(a, b, plus_one), rtol=1e-5, atol=1e-6)


def test_giou(rng):
    a, b = rand_boxes(rng, 9), rand_boxes(rng, 11)
    got = np.asarray(generalized_iou(a, b))
    np.testing.assert_allclose(got, giou_oracle(a, b), rtol=1e-5, atol=1e-6)


def test_intersection_ratio(rng):
    a, b = rand_boxes(rng, 6), rand_boxes(rng, 5)
    got = np.asarray(intersection_ratio(a, b))
    # oracle: inter / area(query) with +1 convention
    exp = np.zeros((6, 5))
    for i, p in enumerate(a):
        for j, q in enumerate(b):
            iw = min(p[2], q[2]) - max(p[0], q[0]) + 1
            ih = min(p[3], q[3]) - max(p[1], q[1]) + 1
            if iw > 0 and ih > 0:
                exp[i, j] = iw * ih / ((q[2] - q[0] + 1) * (q[3] - q[1] + 1))
    np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-6)


def test_center_size(rng):
    a = rand_boxes(rng, 8)
    got = np.asarray(center_size(a))
    wh = a[:, 2:] - a[:, :2] + 1.0
    exp = np.concatenate([a[:, :2] + 0.5 * wh, wh], axis=1)
    np.testing.assert_allclose(got, exp, rtol=1e-6)


def test_union_boxes(rng):
    boxes = rand_boxes(rng, 10)
    pair_idx = np.stack([rng.integers(0, 10, 6), rng.integers(0, 10, 6)], axis=1)
    got = np.asarray(union_boxes(boxes, pair_idx))
    exp = np.concatenate(
        [np.minimum(boxes[pair_idx[:, 0], :2], boxes[pair_idx[:, 1], :2]),
         np.maximum(boxes[pair_idx[:, 0], 2:], boxes[pair_idx[:, 1], 2:])], axis=1)
    np.testing.assert_allclose(got, exp)


def test_draw_union_boxes_golden(rng):
    subj = rand_boxes(rng, 12)
    obj = rand_boxes(rng, 12)
    pairs = np.concatenate([subj, obj], axis=1).astype(np.float32)
    got = np.asarray(draw_union_boxes(pairs, 27, as_nchw=True))
    exp = union_mask_oracle(pairs, 27)
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-5)


def test_draw_union_boxes_padded_pairs_finite():
    pairs = np.zeros((3, 8), dtype=np.float32)
    got = np.asarray(draw_union_boxes(pairs, 27))
    assert np.isfinite(got).all()


def test_nms_matches_oracle(rng):
    boxes = rand_boxes(rng, 40, size=100.0)  # crowded -> many overlaps
    scores = rng.uniform(0, 1, 40).astype(np.float32)
    got = np.asarray(nms_mask(boxes, scores, 0.4))
    exp = nms_oracle(boxes, scores, 0.4)
    np.testing.assert_array_equal(got, exp)


def test_nms_respects_valid_mask(rng):
    boxes = rand_boxes(rng, 20, size=80.0)
    scores = rng.uniform(0, 1, 20).astype(np.float32)
    valid = rng.uniform(0, 1, 20) > 0.3
    got = np.asarray(nms_mask(boxes, scores, 0.5, valid=valid))
    assert not got[~valid].any()
    exp = nms_oracle(boxes[valid], scores[valid], 0.5)
    np.testing.assert_array_equal(got[valid], exp)


def test_batched_nms_classes_independent(rng):
    boxes = np.tile(rand_boxes(rng, 10, size=60.0), (2, 1))
    scores = rng.uniform(0, 1, 20).astype(np.float32)
    cls = np.array([0] * 10 + [1] * 10)
    got = np.asarray(batched_nms_mask(boxes, scores, cls, 0.4))
    exp0 = nms_oracle(boxes[:10], scores[:10], 0.4)
    exp1 = nms_oracle(boxes[10:], scores[10:], 0.4)
    np.testing.assert_array_equal(got, np.concatenate([exp0, exp1]))


def test_roi_align_golden(rng):
    fmap = rng.standard_normal((24, 32, 5)).astype(np.float32)
    rois = rand_boxes(rng, 6, size=300.0)
    got = np.asarray(roi_align(fmap, rois, (7, 7), 1 / 16.0, sampling_ratio=2))
    exp = roi_align_oracle(fmap, rois, (7, 7), 1 / 16.0, 2)
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-5)


def test_roi_align_grad_finite(rng):
    import jax
    import jax.numpy as jnp
    fmap = jnp.asarray(rng.standard_normal((16, 16, 3)).astype(np.float32))
    rois = jnp.asarray(rand_boxes(rng, 3, size=200.0))
    g = jax.grad(lambda f: roi_align(f, rois).sum())(fmap)
    assert np.isfinite(np.asarray(g)).all()


def test_draw_union_boxes_np_matches_xla(rng):
    """The host-path numpy twin must match the XLA rasterizer exactly."""
    from nl_vsgg_tpu.ops.union_masks import draw_union_boxes, draw_union_boxes_np

    rois = rng.uniform(0, 400, (17, 8)).astype(np.float32)
    rois[3] = 0.0  # degenerate padded pair stays finite
    a = np.asarray(draw_union_boxes(rois, 27))
    b = draw_union_boxes_np(rois, 27)
    np.testing.assert_allclose(a, b, atol=1e-6)
    a = np.asarray(draw_union_boxes(rois, 27, as_nchw=True))
    b = draw_union_boxes_np(rois, 27, as_nchw=True)
    np.testing.assert_allclose(a, b, atol=1e-6)

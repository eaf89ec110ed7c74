"""Device-computed spatial masks (width-0 sentinel) parity.

The (R, 27, 27, 2) pair masks are an exact closed-form function of the pair
boxes, so production paths ship a width-0 `Entry.spatial_masks` and the
models rasterize them on device (models/sttran.spatial_mask_input). These
tests pin: (a) model outputs are identical between the host-built masks and
the sentinel, for both model families; (b) the builders emit the sentinel
shape; (c) batching utilities keep the width consistent.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nl_vsgg_tpu.data.entry import MASK_P, empty_entry, pad_entry
from nl_vsgg_tpu.data.synthetic import make_synthetic_entry
from nl_vsgg_tpu.ops.union_masks import draw_union_boxes_np
from nl_vsgg_tpu.train.step import place_entries, stack_entries

FEAT = 32


def _entry_pair(rng, n_frames=4, objs=2, bb=16, br=12):
    """(host-mask entry, sentinel entry) over identical data."""
    e = make_synthetic_entry(rng, n_frames=n_frames, objs_per_frame=objs,
                             bucket_boxes=bb, bucket_rels=br, feat_dim=FEAT)
    boxes = np.asarray(e.boxes)
    pair = np.asarray(e.pair_idx)
    pair_rois = np.concatenate([boxes[pair[:, 0]], boxes[pair[:, 1]]], 1)
    host_masks = (draw_union_boxes_np(pair_rois, MASK_P) - 0.5).astype(np.float32)
    # zero the padded rows like the host builders do (pad_entry zero-fill)
    host_masks[~np.asarray(e.rel_mask)] = 0.0
    e_host = e.replace(spatial_masks=host_masks)
    e_dev = e.replace(
        spatial_masks=np.zeros((br, MASK_P, MASK_P, 0), np.float32))
    return e_host, e_dev


@pytest.mark.parametrize("family", ["sttran", "dsg"])
def test_model_outputs_identical(family, rng=None):
    rng = np.random.default_rng(7)
    e_host, e_dev = _entry_pair(rng)
    if family == "sttran":
        from nl_vsgg_tpu.models.sttran import STTran
        model = STTran(mode="sgdet", obj_classes=("b",) * 37, feat_dim=FEAT)
    else:
        from nl_vsgg_tpu.models.dsg_detr import DSGDETR
        model = DSGDETR(mode="sgdet", obj_classes=("b",) * 37, feat_dim=FEAT)
    variables = model.init(jax.random.key(0), e_host, train=False)
    out_h = model.apply(variables, e_host, train=False)
    out_d = model.apply(variables, e_dev, train=False)
    valid = np.asarray(e_host.rel_mask)
    for key in ("attention_distribution", "spatial_distribution",
                "contacting_distribution", "global_output"):
        a, b = np.asarray(out_h[key]), np.asarray(out_d[key])
        np.testing.assert_allclose(a[valid], b[valid], rtol=0, atol=1e-5,
                                   err_msg=f"{family}:{key}")


def test_builders_emit_sentinel():
    from nl_vsgg_tpu.data.grounding import FrameDetections, build_entry
    from nl_vsgg_tpu.data.grounding import assign_labels_video  # noqa: F401
    rng = np.random.default_rng(0)
    from nl_vsgg_tpu.data.grounding import GroundedFrame
    g = [GroundedFrame(
        has_person=True,
        person_rect=np.array([0, 0, 10, 10], np.float32), person_conf=0.9,
        person_feat=rng.standard_normal(FEAT).astype(np.float32),
        obj_classes=np.array([3]), obj_confs=np.array([0.5], np.float32),
        obj_rects=np.array([[1, 1, 5, 5]], np.float32),
        obj_feats=rng.standard_normal((1, FEAT)).astype(np.float32))]
    gt = [[{"person_bbox": np.zeros(4)},
           {"class": 3, "attention_relationship": np.array([0]),
            "spatial_relationship": np.array([1]),
            "contacting_relationship": np.array([2])}]]
    e = build_entry(g, gt, True, 8, 8, feat_dim=FEAT,
                    compute_spatial_masks=False)
    assert e.spatial_masks.shape == (8, MASK_P, MASK_P, 0)
    e2 = build_entry(g, gt, True, 8, 8, feat_dim=FEAT)
    assert e2.spatial_masks.shape == (8, MASK_P, MASK_P, 2)

    # GT-entry builder (predcls) sentinel
    from nl_vsgg_tpu.data.gt_entry import build_gt_entry

    def feat_fn(i, boxes):
        return np.zeros((len(boxes), FEAT), np.float32)

    gt2 = [[{"person_bbox": np.array([0, 0, 10, 10])},
            {"bbox": np.array([1, 1, 5, 5]), "class": 3,
             "attention_relationship": np.array([0]),
             "spatial_relationship": np.array([1]),
             "contacting_relationship": np.array([2])}]]
    ge = build_gt_entry(gt2, "predcls", 8, 8, feat_fn, feat_dim=FEAT,
                        compute_spatial_masks=False)
    assert ge.spatial_masks.shape == (8, MASK_P, MASK_P, 0)

    # infer-entry builder sentinel
    from nl_vsgg_tpu.data.infer_entry import build_infer_entry
    assign = {
        "boxes": np.array([[0, 0, 10, 10], [1, 1, 5, 5]], np.float32),
        "box_frame": np.array([0, 0]), "features": np.zeros((2, FEAT), np.float32),
        "distribution": np.full((2, 36), 1 / 36, np.float32),
        "pred_labels": np.array([1, 3]), "pred_scores": np.array([0.9, 0.5], np.float32),
        "pair_idx": np.array([[0, 1]]), "im_idx": np.array([0]),
    }
    ie = build_infer_entry(assign, 1, 8, 8, feat_dim=FEAT,
                           compute_spatial_masks=False)
    assert ie.spatial_masks.shape == (8, MASK_P, MASK_P, 0)


def test_batching_keeps_sentinel_width():
    rng = np.random.default_rng(1)
    _, a = _entry_pair(rng)
    _, b = _entry_pair(rng)
    batch = place_entries([a, b], zero_union=True, rel_bf16=True)
    assert batch.spatial_masks.shape == (2, 12, MASK_P, MASK_P, 0)
    assert batch.union_feat.shape[-1] == 0
    stacked = stack_entries([a, b])
    assert stacked.spatial_masks.shape[-1] == 0
    fill = empty_entry(16, 12, feat_dim=FEAT, with_spatial_masks=False)
    assert fill.spatial_masks.shape == (12, MASK_P, MASK_P, 0)
    padded = pad_entry(a, 16, 16)
    assert padded.spatial_masks.shape == (16, MASK_P, MASK_P, 0)

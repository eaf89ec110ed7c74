"""Headline benchmark: STTran SGDet inference frames/sec/chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Our side: the jit-compiled STTran relation model (sgdet weak-supervision
branch) over a padded 32-frame / 128-box / 96-relation Entry at the real
feature width (2048), on whatever single chip JAX exposes.

Baseline: the PyTorch reference model (lib/sttran.py + lib/transformer_wk.py)
run on the same inputs on this host (torch has no CUDA here, so this is
torch-CPU; the reference's own GPU numbers are not published — BASELINE.md).
The measured baseline is cached in BASELINE_MEASURED.json so repeat runs are
cheap; delete the file to re-measure.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

N_FRAMES, OBJS_PER_FRAME = 32, 3
BUCKET_BOXES, BUCKET_RELS = 128, 96
FEAT_DIM = 2048
WARMUP, ITERS = 3, 20
CACHE = os.path.join(REPO, "BASELINE_MEASURED.json")


def bench_ours(batch_videos: int = 64) -> float:
    """Batched (vmap) inference — the deployment shape on one chip."""
    import jax
    from nl_vsgg_tpu.data.synthetic import make_synthetic_entry
    from nl_vsgg_tpu.models.sttran import STTran
    from nl_vsgg_tpu.train import stack_entries

    rng = np.random.default_rng(1000)
    entries = [make_synthetic_entry(rng, n_frames=N_FRAMES,
                                    objs_per_frame=OBJS_PER_FRAME,
                                    bucket_boxes=BUCKET_BOXES, bucket_rels=BUCKET_RELS,
                                    feat_dim=FEAT_DIM) for _ in range(batch_videos)]
    batch = jax.tree.map(jax.numpy.asarray, stack_entries(entries))
    model = STTran(mode="sgdet", feat_dim=FEAT_DIM)
    one = jax.tree.map(lambda x: x[0], batch)
    variables = model.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
                           one, train=False)
    fwd = jax.jit(lambda v, b: jax.vmap(lambda e: model.apply(v, e, train=False))(b))
    for _ in range(WARMUP):
        out = fwd(variables, batch)
    jax.block_until_ready(out)
    # median of repeated timed blocks: the shared chip shows ~2x run-to-run
    # variance, the median is stable
    rates = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fwd(variables, batch)
        jax.block_until_ready(out)
        rates.append(batch_videos * N_FRAMES * ITERS / (time.perf_counter() - t0))
    return float(np.median(rates))


def bench_reference() -> float | None:
    """Torch reference STTran forward on the same shapes (this host)."""
    ref = "/root/reference"
    if not os.path.isdir(ref):
        return None
    try:
        import types

        import torch

        # stub the GloVe downloader + uncompiled native modules before import;
        # none are exercised by the wks sgdet forward path we time
        fake = types.ModuleType("lib.word_vectors")
        fake.obj_edge_vectors = lambda names, wv_type=None, wv_dir=None, wv_dim=200: \
            torch.randn(len(names), wv_dim)
        sys.modules["lib.word_vectors"] = fake
        bbox = types.ModuleType("lib.fpn.box_intersections_cpu.bbox")
        bbox.bbox_overlaps = bbox.bbox_intersections = lambda *a, **k: None
        sys.modules["lib.fpn.box_intersections_cpu.bbox"] = bbox
        draw = types.ModuleType("lib.draw_rectangles.draw_rectangles")
        draw.draw_union_boxes = lambda *a, **k: None
        sys.modules["lib.draw_rectangles.draw_rectangles"] = draw
        roi = types.ModuleType("fasterRCNN.lib.model.roi_layers")
        roi.ROIAlign = lambda *a, **k: (lambda *aa, **kk: None)
        roi.nms = lambda *a, **k: None
        sys.modules["fasterRCNN.lib.model.roi_layers"] = roi
        ebf = types.ModuleType("lib.extract_bbox_features")
        ebf.extract_feature_given_bbox_base_feat_torch = lambda *a, **k: None
        sys.modules["lib.extract_bbox_features"] = ebf
        if ref not in sys.path:
            sys.path.insert(0, ref)
        from lib.transformer_wk import transformer_wk  # noqa: F401 (import check)
        from lib.sttran import STTran as RefSTTran

        # the reference passes int key_padding_masks (lib/transformer_wk.py:154)
        # which modern torch rejects; coerce to bool, semantics unchanged
        orig_fwd = torch.nn.MultiheadAttention.forward

        def _fwd(self, *a, **kw):
            kpm = kw.get("key_padding_mask")
            if kpm is not None and kpm.dtype not in (torch.bool, torch.float32):
                kw["key_padding_mask"] = kpm.bool()
            return orig_fwd(self, *a, **kw)

        torch.nn.MultiheadAttention.forward = _fwd

        torch.manual_seed(0)
        torch.set_num_threads(os.cpu_count() or 4)
        classes = [f"c{i}" for i in range(37)]
        model = RefSTTran(mode="sgdet",
                          attention_class_num=3, spatial_class_num=6,
                          contact_class_num=17, obj_classes=classes,
                          enc_layer_num=1, dec_layer_num=3, is_wks=True,
                          feat_dim=FEAT_DIM, transformer_mode="wk")
        model.eval()

        from nl_vsgg_tpu.data.synthetic import make_synthetic_entry
        rng = np.random.default_rng(1000)
        e = make_synthetic_entry(rng, n_frames=N_FRAMES, objs_per_frame=OBJS_PER_FRAME,
                                 bucket_boxes=BUCKET_BOXES, bucket_rels=BUCKET_RELS,
                                 feat_dim=FEAT_DIM)
        nb = int(np.asarray(e.box_mask).sum())
        nr = int(np.asarray(e.rel_mask).sum())
        t = lambda a, dt=torch.float32: torch.as_tensor(np.asarray(a), dtype=dt)
        boxes5 = torch.cat([t(e.box_frame[:nb]).float()[:, None], t(e.boxes[:nb])], 1)
        entry = {
            "boxes": boxes5,
            "labels": t(e.labels[:nb], torch.long),
            "scores": t(e.scores[:nb]),
            "distribution": t(e.distribution[:nb]),
            "features": t(e.features[:nb]),
            "pair_idx": t(e.pair_idx[:nr], torch.long),
            "im_idx": t(e.im_idx[:nr], torch.long),
            # torch layout is channel-first
            "union_feat": t(np.ascontiguousarray(
                np.moveaxis(np.asarray(e.union_feat[:nr]), -1, 1))),
            "spatial_masks": t(np.ascontiguousarray(
                np.moveaxis(np.asarray(e.spatial_masks[:nr]), -1, 1))),
        }
        with torch.no_grad():
            for _ in range(max(1, WARMUP - 2)):
                model(dict(entry))
            t0 = time.perf_counter()
            for _ in range(ITERS):
                model(dict(entry))
            dt = time.perf_counter() - t0
        return N_FRAMES * ITERS / dt
    except Exception as ex:  # pragma: no cover - baseline is best-effort
        print(f"# reference baseline unavailable: {ex!r}", file=sys.stderr)
        return None


def main():
    ours = bench_ours()
    baseline = None
    if os.path.isfile(CACHE):
        try:
            baseline = json.load(open(CACHE)).get("frames_per_sec")
        except Exception:
            baseline = None
    if baseline is None:
        baseline = bench_reference()
        if baseline is not None:
            json.dump({"frames_per_sec": baseline,
                       "note": "torch reference lib/sttran.py on this host (CPU)",
                       "shapes": dict(frames=N_FRAMES, boxes=BUCKET_BOXES,
                                      rels=BUCKET_RELS, feat_dim=FEAT_DIM)},
                      open(CACHE, "w"), indent=1)
    vs = (ours / baseline) if baseline else None
    print(json.dumps({"metric": "sttran_sgdet_inference_frames_per_sec_per_chip",
                      "value": round(ours, 2), "unit": "frames/sec",
                      "vs_baseline": round(vs, 3) if vs else None}))


if __name__ == "__main__":
    main()

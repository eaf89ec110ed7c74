"""Build a micro on-disk Action Genome dataset (reference pickle/npy schemas)
for end-to-end CLI tests: frame_features/{video}/{frame}/dets.npy+feat.npy,
final_ag_data_w_neg.pkl, triplets_LLM4SGG.pkl, ag_img_info_*.pkl, and
annotations/person_bbox.pkl + object_bbox_and_relationship*.pkl."""

from __future__ import annotations

import importlib.util
import os
import pickle
import sys

import numpy as np

from nl_vsgg_tpu.data import schema

TOOLS_DIR = os.path.join(os.path.dirname(__file__), "..", "tools")


def load_tool(name: str):
    """Import tools/<name>.py as a module (shared by every CLI test)."""
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(TOOLS_DIR, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def build_micro_ag(root: str, n_videos: int = 3, n_frames: int = 4,
                   feat_dim: int = 64, seed: int = 0,
                   n_objs: int = 2) -> str:
    """`n_objs` = annotated objects per frame (each also a detection; real AG
    frames carry ~10-40 detections — bench_suite's grounding row raises
    this for realism)."""
    rng = np.random.default_rng(seed)
    tax = schema.load_taxonomy()
    oi_to_ag, ag_to_oi = schema.load_oi_ag_maps()
    person_ids = list(ag_to_oi[1])
    # OI classes with exactly one AG mapping, excluding person
    single = [(k, v[0]) for k, v in oi_to_ag.items()
              if len(v) == 1 and k not in set(person_ids) and v[0] >= 2]

    ag = os.path.join(root, "AG")
    ann_dir = os.path.join(ag, "annotations")
    os.makedirs(ann_dir, exist_ok=True)

    pseudo, frame_lists, img_info_train, img_info_test = {}, {}, {}, {}
    person_bbox, object_bbox = {}, {}

    for v in range(n_videos):
        vid = f"vid{v:03d}.mp4"
        frames = [f"{i:06d}.png" for i in range(n_frames)]
        frame_lists[vid] = {"frame_list": frames}
        img_info_train[vid] = [480.0, 640.0, 1.0]
        img_info_test[vid] = [480.0, 640.0, 1.0]
        video_gt = []
        for i, fr in enumerate(frames):
            fdir = os.path.join(ag, "frame_features", vid, fr)
            os.makedirs(fdir, exist_ok=True)
            person_rect = np.array([20 + i, 30, 120 + i, 260], np.float32)
            picks = rng.choice(len(single), size=n_objs, replace=False)
            dets = [{"class": person_ids[0], "conf": np.float32(0.95),
                     "rect": person_rect}]
            frame_gt = [{"person_bbox": person_rect[None]}]
            obj_entries = []
            for j, p in enumerate(picks):
                oi_cls, ag_cls = single[int(p)]
                rect = np.array([40 + 50 * j, 60, 110 + 50 * j, 150], np.float32)
                dets.append({"class": oi_cls, "conf": np.float32(0.7 + 0.1 * j),
                             "rect": rect})
                rels = {
                    "attention_relationship": np.array([int(rng.integers(0, 3))]),
                    "spatial_relationship": np.array([int(rng.integers(0, 6))]),
                    "contacting_relationship": np.array([int(rng.integers(0, 17))]),
                }
                frame_gt.append(dict({"class": int(ag_cls), "bbox": rect}, **rels))
                obj_entries.append((ag_cls, rect, rels))
            np.save(os.path.join(fdir, "dets.npy"), np.asarray(dets, object),
                    allow_pickle=True)
            np.save(os.path.join(fdir, "feat.npy"),
                    rng.standard_normal((len(dets), feat_dim)).astype(np.float32))
            video_gt.append(frame_gt)

            # GT test annotations for the same video (names, xywh boxes)
            key = f"{vid}/{fr}"
            person_bbox[key] = {"bbox": person_rect[None], "bbox_size": (640, 480)}
            object_bbox[key] = [{
                "class": tax.object_classes[cls],  # dataset spellings
                "bbox": [float(r[0]), float(r[1]),
                         float(r[2] - r[0]), float(r[3] - r[1])],
                "visible": True, "metadata": {"set": "test"},
                "attention_relationship": [tax.attention_relationships[int(rel["attention_relationship"][0])]],
                "spatial_relationship": [tax.spatial_relationships[int(rel["spatial_relationship"][0])]],
                "contacting_relationship": [tax.contacting_relationships[int(rel["contacting_relationship"][0])]],
            } for cls, r, rel in obj_entries]
        pseudo[vid] = video_gt

    with open(os.path.join(ag, "final_ag_data_w_neg.pkl"), "wb") as f:
        pickle.dump(pseudo, f)
    with open(os.path.join(ag, "triplets_LLM4SGG.pkl"), "wb") as f:
        pickle.dump(frame_lists, f)
    with open(os.path.join(ag, "ag_img_info_train.pkl"), "wb") as f:
        pickle.dump(img_info_train, f)
    with open(os.path.join(ag, "ag_img_info_test.pkl"), "wb") as f:
        pickle.dump(img_info_test, f)
    with open(os.path.join(ann_dir, "person_bbox.pkl"), "wb") as f:
        pickle.dump(person_bbox, f)
    for name in ("object_bbox_and_relationship_filtersmall.pkl",
                 "object_bbox_and_relationship.pkl"):
        with open(os.path.join(ann_dir, name), "wb") as f:
            pickle.dump(object_bbox, f)
    return ag


def make_vinvl_state_dict(rng, randomize_bn: bool = False) -> dict:
    """Synthetic maskrcnn-style VinVL state dict with the real model's key
    names and shapes (ResNeXt-152-C4 32x8d + RPN head + C5 box head).
    randomize_bn exercises the FrozenBN folding with non-trivial stats."""
    sd = {}

    def add_conv(name, cout, cin, k, bias=False, groups=1):
        sd[name + ".weight"] = rng.standard_normal(
            (cout, cin // groups, k, k)).astype(np.float32) * 0.05
        if bias:
            sd[name + ".bias"] = np.zeros(cout, np.float32)

    def add_bn(name, c):
        if randomize_bn:
            sd[name + ".weight"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
            sd[name + ".bias"] = rng.standard_normal(c).astype(np.float32) * 0.1
            sd[name + ".running_mean"] = rng.standard_normal(c).astype(np.float32) * 0.1
            sd[name + ".running_var"] = rng.uniform(0.5, 2.0, c).astype(np.float32)
        else:
            sd[name + ".weight"] = np.ones(c, np.float32)
            sd[name + ".bias"] = np.zeros(c, np.float32)
            sd[name + ".running_mean"] = np.zeros(c, np.float32)
            sd[name + ".running_var"] = np.ones(c, np.float32)

    add_conv("backbone.body.stem.conv1", 64, 3, 7)
    add_bn("backbone.body.stem.bn1", 64)
    specs = [("layer1", 3, 64, 256, 256), ("layer2", 8, 256, 512, 512),
             ("layer3", 36, 512, 1024, 1024)]
    for lname, n, cin, mid, cout in specs:
        for i in range(n):
            p = f"backbone.body.{lname}.{i}"
            c_in = cin if i == 0 else cout
            add_conv(p + ".conv1", mid, c_in, 1)
            add_bn(p + ".bn1", mid)
            add_conv(p + ".conv2", mid, mid, 3, groups=32)
            add_bn(p + ".bn2", mid)
            add_conv(p + ".conv3", cout, mid, 1)
            add_bn(p + ".bn3", cout)
            if i == 0:
                add_conv(p + ".downsample.0", cout, c_in, 1)
                add_bn(p + ".downsample.1", cout)
    add_conv("rpn.head.conv", 1024, 1024, 3, bias=True)
    add_conv("rpn.head.cls_logits", 15, 1024, 1, bias=True)
    add_conv("rpn.head.bbox_pred", 60, 1024, 1, bias=True)
    for i in range(3):
        p = f"roi_heads.box.feature_extractor.head.layer4.{i}"
        c_in = 1024 if i == 0 else 2048
        add_conv(p + ".conv1", 2048, c_in, 1)
        add_bn(p + ".bn1", 2048)
        add_conv(p + ".conv2", 2048, 2048, 3, groups=32)
        add_bn(p + ".bn2", 2048)
        add_conv(p + ".conv3", 2048, 2048, 1)
        add_bn(p + ".bn3", 2048)
        if i == 0:
            add_conv(p + ".downsample.0", 2048, c_in, 1)
            add_bn(p + ".downsample.1", 2048)
    sd["roi_heads.box.predictor.cls_score.weight"] = \
        rng.standard_normal((1595, 2048)).astype(np.float32) * 0.01
    sd["roi_heads.box.predictor.cls_score.bias"] = np.zeros(1595, np.float32)
    sd["roi_heads.box.predictor.bbox_pred.weight"] = \
        rng.standard_normal((1595 * 4, 2048)).astype(np.float32) * 0.01
    sd["roi_heads.box.predictor.bbox_pred.bias"] = np.zeros(1595 * 4, np.float32)
    return sd

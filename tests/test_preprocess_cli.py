"""tools/preprocess.py CLI integration: the offline weak-supervision chain
img-info -> tcs -> triplets -> adv -> negatives driven through the real
argparse surface, producing reference-schema pickles end to end (LLM calls
faked at the _openai_llm seam; CLIP embeddings synthesized)."""

import os
import pickle
import sys

import numpy as np
import pytest

from tests.fixtures import load_tool as _load_tool

TCS_RESPONSE = ("Output:  A person opens a door. >> "
                "The person picks up a book. >> The person reads a book.")
TRIPLET_RESPONSE = (
    "Input: A person opens a door. Output: "
    "Step 1: Triplets extracted from the sentence are <person, opens, door>. "
    "Step 2: Triplets aligned with the predefined entity/predicate lexicons "
    "are <1.person, 22.touching, 13.door>."
)


def _run(monkeypatch, mod, argv):
    monkeypatch.setattr(sys, "argv", ["preprocess.py"] + argv)
    mod.main()


def test_offline_pipeline_cli_chain(tmp_path, monkeypatch):
    cv2 = pytest.importorskip("cv2")
    from nl_vsgg_tpu.data import schema

    pre = _load_tool("preprocess")
    tax = schema.load_taxonomy()
    _, ag_to_oi = schema.load_oi_ag_maps()

    vid = "v001.mp4"
    T = 12
    frames = [f"{i + 1:06d}.png" for i in range(T)]

    # ---- img-info over one real frame directory (600/1000 scale math) ----
    fdir = tmp_path / "frames" / vid
    os.makedirs(fdir)
    cv2.imwrite(str(fdir / frames[0]),
                np.zeros((480, 640, 3), np.uint8))
    info_pkl = str(tmp_path / "ag_img_info_train.pkl")
    _run(monkeypatch, pre, ["img-info", "--frames", str(tmp_path / "frames"),
                            "--output", info_pkl])
    info = pickle.load(open(info_pkl, "rb"))
    # reference artifact schema: (1, 3) float32 tensor/array [bh, bw, scale]
    # with the UNCAPPED 600/min scale (extract_ag_img_info.py:27,32-34)
    assert tuple(info[vid].shape) == (1, 3)
    np.testing.assert_allclose(np.asarray(info[vid]).reshape(-1),
                               [600.0, 800.0, 1.25])

    # ---- tcs: caption -> chronologically split sentences ----
    csv_path = str(tmp_path / "captions.csv")
    with open(csv_path, "w") as f:
        f.write("id,descriptions\nv001,A person opens a door then reads\n")
    ids_pkl = str(tmp_path / "ag_train_id.pkl")
    pickle.dump({vid: frames}, open(ids_pkl, "wb"))
    split_pkl = str(tmp_path / "split_action_dict.pkl")
    monkeypatch.setattr(pre, "_openai_llm", lambda m, k: (lambda p: TCS_RESPONSE))
    _run(monkeypatch, pre, ["tcs", "--captions", csv_path, "--frame_ids", ids_pkl,
                            "--output", split_pkl, "--api_key", "fake"])
    split = pickle.load(open(split_pkl, "rb"))
    assert split[vid][0][0] == "A person opens a door"

    # ---- triplets: sentences -> lexicon-aligned triplets ----
    tri_pkl = str(tmp_path / "triplets_LLM4SGG.pkl")
    monkeypatch.setattr(pre, "_openai_llm", lambda m, k: (lambda p: TRIPLET_RESPONSE))
    _run(monkeypatch, pre, ["triplets", "--split_actions", split_pkl,
                            "--frame_ids", ids_pkl, "--output", tri_pkl,
                            "--api_key", "fake"])
    tri = pickle.load(open(tri_pkl, "rb"))
    assert tri[vid]["frame_list"] == frames
    n_sentences = sum(len(g) for g in tri[vid]["split_sentence"])
    assert n_sentences == 3
    assert ("person", "touching", "door") in tri[vid]["triplets"][0][0]

    # ---- adv: synthetic CLIP embeddings, 3 temporal phases of 4 frames ----
    rng = np.random.default_rng(0)
    D = 16
    protos = rng.standard_normal((3, D))
    text = protos + 0.01 * rng.standard_normal((3, D))
    vis = np.concatenate([protos[i] + 0.05 * rng.standard_normal((4, D))
                          for i in range(3)])
    emb_pkl = str(tmp_path / "embeddings.pkl")
    pickle.dump({vid: {"text": [text.astype(np.float32)],
                       "frames": vis.astype(np.float32)}}, open(emb_pkl, "wb"))
    semi_pkl = str(tmp_path / "semi_final_ag_data.pkl")
    final_pkl = str(tmp_path / "final_ag_data.pkl")
    _run(monkeypatch, pre, ["adv", "--triplets", tri_pkl, "--embeddings", emb_pkl,
                            "--semi_output", semi_pkl, "--output", final_pkl])
    final = pickle.load(open(final_pkl, "rb"))
    semi = pickle.load(open(semi_pkl, "rb"))
    assert len(semi[vid]["mapped_frame"]) == n_sentences
    door_idx = list(tax.object_classes_pipeline).index("door")
    contacting = list(tax.contacting_relationships_gt)
    labeled = [d for fr in final[vid] for d in fr if d.get("class") == door_idx]
    assert labeled, "no frame got the person-door triplet"
    assert all(contacting[int(r)] == "touching"
               for d in labeled for r in d["contacting_relationship"])

    # ---- negatives: cached dets supply the person-object gIoU trend ----
    person_oi = ag_to_oi[1][0]
    door_oi = ag_to_oi[door_idx][0]
    feat_root = tmp_path / "frame_features"
    for i, fr in enumerate(frames):
        d = feat_root / vid / fr
        os.makedirs(d)
        # object drifts away from the fixed person box over time
        dets = [{"class": person_oi, "conf": np.float32(0.9),
                 "rect": np.array([10, 10, 100, 200], np.float32)},
                {"class": door_oi, "conf": np.float32(0.8),
                 "rect": np.array([120 + 40 * i, 10, 220 + 40 * i, 200],
                                  np.float32)}]
        np.save(str(d / "dets.npy"), np.asarray(dets, object), allow_pickle=True)
    neg_pkl = str(tmp_path / "final_ag_data_w_neg.pkl")
    _run(monkeypatch, pre, ["negatives", "--final", final_pkl, "--semi", semi_pkl,
                            "--features", str(feat_root), "--output", neg_pkl])
    neg = pickle.load(open(neg_pkl, "rb"))
    assert vid in neg and len(neg[vid]) == T
    # schema must be consumable by the training reader: per-frame lists of
    # {person_bbox} + {class, bbox, 3 relationship arrays} dicts
    for fr in neg[vid]:
        for d in fr:
            if "person_bbox" in d:
                continue
            assert {"class", "bbox", "attention_relationship",
                    "spatial_relationship",
                    "contacting_relationship"} <= set(d)

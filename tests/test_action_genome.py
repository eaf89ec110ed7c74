"""Dataset-layer tests on hand-built pickle fixtures, asserting the
reference's documented filtering/conversion rules (wk_action_genome.py)."""

import os
import pickle

import numpy as np
import pytest

from nl_vsgg_tpu.data import schema
from nl_vsgg_tpu.data.action_genome import AGTest, AGTrain


def _dump(tmp, name, obj):
    path = os.path.join(tmp, name)
    with open(path, "wb") as f:
        pickle.dump(obj, f)
    return path


@pytest.fixture
def train_fixture(tmp_path, rng):
    tmp = str(tmp_path)
    ann = lambda cls: {"class": cls, "bbox": np.zeros(4),
                       "attention_relationship": np.array([0]),
                       "spatial_relationship": np.array([1, 2]),
                       "contacting_relationship": np.array([3])}
    pseudo = {
        "vidA.mp4": [[{"person_bbox": np.zeros(4)}, ann(5)],
                     [{"person_bbox": np.zeros(4)}, ann(7), ann(9)]],
        "vidB.mp4": [[{"person_bbox": np.zeros(4)}, ann(3)]],
        "vidC.mp4": [[{"person_bbox": np.zeros(4)}, ann(4)]],  # not in frame list
    }
    frame_list = {
        "vidA.mp4": {"frame_list": ["000001.png", "000033.png"]},
        "vidB.mp4": {"frame_list": ["000002.png"]},
    }
    import torch
    # vidA: our legacy plain-list form; vidB: the reference's (1, 3) float32
    # torch-tensor artifact schema (extract_ag_img_info.py:32-34) — both must
    # normalize to [h, w, scale] floats
    img_info = {"vidA.mp4": [600.0, 1000.0, 1.25],
                "vidB.mp4": torch.tensor([[480.0, 640.0, 1.0]])}
    _dump(tmp, "final_ag_data_w_neg.pkl", pseudo)
    _dump(tmp, "triplets_LLM4SGG.pkl", frame_list)
    _dump(tmp, "ag_img_info_train.pkl", img_info)
    return tmp


class TestAGTrain:
    def test_join_and_filters(self, train_fixture):
        ds = AGTrain(train_fixture)
        # vidC dropped (no frame list), vidB dropped (single frame)
        assert ds.video_ids == ["vidA.mp4"]
        assert ds.video_list[0] == ["vidA.mp4/000001.png", "vidA.mp4/000033.png"]
        assert ds.img_info[0] == [600.0, 1000.0, 1.25]
        assert len(ds.gt_annotations[0]) == 2

    def test_keep_single_frame_videos_when_asked(self, train_fixture):
        ds = AGTrain(train_fixture, remove_one_frame_video=False)
        assert ds.video_ids == ["vidA.mp4", "vidB.mp4"]
        # the reference tensor artifact normalized to plain floats
        assert ds.img_info[1] == [480.0, 640.0, 1.0]

    def test_action_statistics(self, train_fixture):
        ds = AGTrain(train_fixture, remove_one_frame_video=False)
        # 4 annotated objects x (1 att + 2 sp + 1 con) = 16 triplets
        assert ds.triplet_count == 16
        tax = schema.load_taxonomy()
        assert ds.action_count[tax.relationship_classes_gt[0]] == 4     # attention 0
        assert ds.action_count[tax.relationship_classes_gt[3 + 1]] == 4  # spatial 1
        assert ds.action_count[tax.relationship_classes_gt[9 + 3]] == 4  # contact 3

    def test_action_distribution_chart(self, train_fixture, tmp_path):
        # startup bar chart parity (ref dataloader/wk_action_genome.py:152-160)
        AGTrain(train_fixture, remove_one_frame_video=False,
                save_path=str(tmp_path))
        assert (tmp_path / "action_dist.png").stat().st_size > 0

    def test_auto_download_fetches_missing_artifacts(self, train_fixture, tmp_path):
        """First-run auto-download (ref wk_action_genome.py:13-15,92-106):
        missing pickles are fetched from the HF dataset URL; here the fetch is
        mocked to copy the fixture pickles into place."""
        import shutil

        from nl_vsgg_tpu.data.action_genome import HF_DATA_URL, TRAIN_ARTIFACTS

        empty = str(tmp_path / "empty")
        os.makedirs(empty)
        fetched = []

        def fake_fetch(url, dest):
            fetched.append(url)
            name = url.rsplit("/", 1)[-1]
            shutil.copy(os.path.join(train_fixture, name), dest)

        ds = AGTrain(empty, auto_download=True, fetch_fn=fake_fetch)
        assert ds.video_ids == ["vidA.mp4"]
        assert sorted(fetched) == sorted(f"{HF_DATA_URL}/{n}" for n in TRAIN_ARTIFACTS)
        # second construction finds the files and does not re-fetch
        fetched.clear()
        AGTrain(empty, auto_download=True, fetch_fn=fake_fetch)
        assert fetched == []

    def test_auto_download_offline_fallback(self, tmp_path):
        """A failing fetch degrades to the plain missing-file error and leaves
        no partial .part files behind."""
        empty = str(tmp_path / "empty2")
        os.makedirs(empty)

        def broken_fetch(url, dest):
            with open(dest, "wb") as f:
                f.write(b"partial")
            raise IOError("no network")

        with pytest.raises(FileNotFoundError):
            AGTrain(empty, auto_download=True, fetch_fn=broken_fetch)
        assert not any(f.endswith(".part") for f in os.listdir(empty))

    def test_auto_download_checksum_rejects_corrupt(self, tmp_path):
        from nl_vsgg_tpu.data.action_genome import maybe_download

        dest = str(tmp_path / "f.pkl")

        def fetch(url, d):
            with open(d, "wb") as f:
                f.write(b"corrupt")

        maybe_download(dest, "f.pkl", enabled=True, fetch_fn=fetch,
                       sha256="0" * 64)
        assert not os.path.exists(dest)  # rejected, cleaned up


@pytest.fixture
def test_fixture(tmp_path):
    tmp = str(tmp_path)
    tax = schema.load_taxonomy()
    person = lambda n: {"bbox": np.ones((n, 4), np.float32), "bbox_size": (480, 270)}

    def obj(visible=True, split="test", cls_idx=5):
        # dataset spellings (the reference's canonicalized names)
        return {"class": tax.object_classes[cls_idx], "bbox": [10, 20, 30, 40],
                "visible": visible, "metadata": {"set": split},
                "attention_relationship": [tax.attention_relationships[1]],
                "spatial_relationship": [tax.spatial_relationships[0],
                                         tax.spatial_relationships[2]],
                "contacting_relationship": [tax.contacting_relationships[4]]}

    person_bbox, object_bbox = {}, {}
    # vid1: 3 person frames + 1 no-person frame -> kept with 3 frames
    for i in range(4):
        key = f"vid1.mp4/{i:06d}.png"
        person_bbox[key] = person(0 if i == 3 else 1)
        object_bbox[key] = [obj()]
    # vid2: 2 valid frames -> dropped (reference counts it as non_person_video)
    for i in range(2):
        key = f"vid2.mp4/{i:06d}.png"
        person_bbox[key] = person(1)
        object_bbox[key] = [obj()]
    # vid3: train split -> ignored entirely
    key = "vid3.mp4/000000.png"
    person_bbox[key] = person(1)
    object_bbox[key] = [obj(split="train")]
    # vid4: frames whose objects are all invisible never enter video_dict
    key = "vid4.mp4/000000.png"
    person_bbox[key] = person(1)
    object_bbox[key] = [obj(visible=False)]

    _dump(tmp, "person_bbox.pkl", person_bbox)
    _dump(tmp, "object_bbox_and_relationship_filtersmall.pkl", object_bbox)
    _dump(tmp, "object_bbox_and_relationship.pkl", object_bbox)
    return tmp


class TestAGTest:
    def test_filtering(self, test_fixture):
        ds = AGTest(test_fixture)
        assert ds.video_ids == ["vid1.mp4"]
        assert len(ds.video_list[0]) == 3
        assert ds.non_gt_human_nums == 1
        assert ds.non_person_video == 1  # vid2 (2 frames) — reference quirk
        assert ds.valid_nums == 5  # 3 (vid1) + 2 (vid2)

    def test_gt_conversion(self, test_fixture):
        ds = AGTest(test_fixture)
        frame_gt = ds.gt_annotations[0][0]
        assert "person_bbox" in frame_gt[0]
        o = frame_gt[1]
        assert o["class"] == 5
        np.testing.assert_array_equal(o["bbox"], [10, 20, 40, 60])  # xywh->xyxy
        np.testing.assert_array_equal(o["attention_relationship"], [1])
        np.testing.assert_array_equal(o["spatial_relationship"], [0, 2])
        np.testing.assert_array_equal(o["contacting_relationship"], [4])

    def test_evaluator_accepts_gt(self, test_fixture):
        from nl_vsgg_tpu.eval import SceneGraphEvaluator
        ds = AGTest(test_fixture)
        ev = SceneGraphEvaluator(mode="sgdet")
        ev.evaluate_scene_graph(ds.gt_annotations[0], {})
        assert len(ev.recall[20]) == 3


def test_agtest_golden_vs_reference(tmp_path, monkeypatch):
    """AGTest vs the live reference AG_Test on the micro fixture: same kept
    videos, same frame lists, and identical converted GT annotations
    (class/name indices, xywh->xyxy, relationship-name->index tensors)."""
    import os
    import pickle
    import shutil
    import sys

    import pytest

    REF = "/root/reference"
    if not os.path.isdir(REF):
        pytest.skip("reference not mounted")
    torch = pytest.importorskip("torch")
    from tests.fixtures import build_micro_ag
    from tests.ref_stubs import install
    install()

    ag = build_micro_ag(str(tmp_path), n_videos=3, n_frames=4, feat_dim=16)
    ann = os.path.join(ag, "annotations")
    # the reference reads the raw class-name txts from its data root and
    # ag_img_info_test.pkl from a CWD-relative hardcoded path
    assets = os.path.join(os.path.dirname(__file__), "..", "assets")
    for t in ("object_classes.txt", "relationship_classes.txt"):
        shutil.copy(os.path.join(assets, t), os.path.join(ann, t))
    os.makedirs(tmp_path / "datasets" / "AG", exist_ok=True)
    shutil.copy(os.path.join(ag, "ag_img_info_test.pkl"),
                tmp_path / "datasets" / "AG" / "ag_img_info_test.pkl")
    monkeypatch.chdir(tmp_path)

    from dataloader.wk_action_genome import AG_Test as RefAGTest

    class _Log:
        def info(self, *a, **k):
            pass

    # NB the reference MUTATES object_bbox entries in place while converting;
    # our AGTest must therefore load its own pickle copies (it does)
    ref = RefAGTest("test", _Log(), data_path=ann)
    ours = AGTest(ann)

    assert ours.video_ids == [v[0].split("/")[0] for v in ref.video_list]
    assert ours.video_list == ref.video_list
    assert ours.non_gt_human_nums == ref.non_gt_human_nums
    assert ours.non_person_video == ref.non_person_video
    assert ours.one_frame_video == ref.one_frame_video
    for gv_ours, gv_ref in zip(ours.gt_annotations, ref.gt_annotations):
        assert len(gv_ours) == len(gv_ref)
        for gf_ours, gf_ref in zip(gv_ours, gv_ref):
            assert len(gf_ours) == len(gf_ref)
            np.testing.assert_array_equal(gf_ours[0]["person_bbox"],
                                          gf_ref[0]["person_bbox"])
            for mo, mr in zip(gf_ours[1:], gf_ref[1:]):
                assert int(mo["class"]) == int(mr["class"])
                np.testing.assert_allclose(mo["bbox"], mr["bbox"])
                for key in ("attention_relationship", "spatial_relationship",
                            "contacting_relationship"):
                    np.testing.assert_array_equal(
                        np.asarray(mo[key]).reshape(-1),
                        mr[key].numpy().reshape(-1))

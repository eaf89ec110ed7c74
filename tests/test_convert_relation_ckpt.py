"""File-level golden test of tools/convert_relation_ckpt.py: a reference
torch checkpoint ({'state_dict': ...}, the format its tools load at
/root/reference/tools/test_STTran.py:51-52) converted on disk, restored via
Orbax, must reproduce the torch model's forward on the same Entry — the
switching-user path end to end (save -> convert CLI -> restore -> apply)."""

import os

import numpy as np
import pytest

import jax

from nl_vsgg_tpu.data.synthetic import make_synthetic_entry

REF = "/root/reference"
torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")

FEAT = 2048


def _entry_and_torch(rng):
    from tests.test_model_parity import _entry_to_torch
    entry = make_synthetic_entry(rng, n_frames=4, objs_per_frame=2,
                                 bucket_boxes=16, bucket_rels=12, feat_dim=FEAT)
    return entry, _entry_to_torch(entry)


def _convert_and_restore(tmp_path, ckpt_path, model, entry, family=None):
    from tests.fixtures import load_tool
    from nl_vsgg_tpu.train import create_train_state, make_optimizer
    from nl_vsgg_tpu.utils.checkpoint import restore_checkpoint

    conv = load_tool("convert_relation_ckpt")
    out = str(tmp_path / "converted")
    argv = ["--ckpt", ckpt_path, "--out", out]
    if family:
        argv += ["--family", family]
    conv.main(argv)

    state, _ = create_train_state(model, entry, jax.random.key(1),
                                  tx=make_optimizer(1e-5))
    return restore_checkpoint(out, state)


def _compare(ours, ref_out, nr, nb):
    for k in ("attention_distribution", "spatial_distribution",
              "contacting_distribution"):
        np.testing.assert_allclose(np.asarray(ours[k])[:nr],
                                   ref_out[k].detach().numpy(),
                                   atol=2e-4, err_msg=k)
    np.testing.assert_allclose(np.asarray(ours["distribution"])[:nb],
                               ref_out["distribution"].detach().numpy(),
                               atol=2e-4)


def test_sttran_checkpoint_roundtrip(tmp_path, rng):
    from tests.ref_stubs import install
    install()
    from lib.sttran import STTran as RefSTTran
    from nl_vsgg_tpu.models.sttran import STTran

    torch.manual_seed(21)
    classes = [f"c{i}" for i in range(37)]
    ref = RefSTTran(mode="sgdet", attention_class_num=3, spatial_class_num=6,
                    contact_class_num=17, obj_classes=classes, enc_layer_num=1,
                    dec_layer_num=3, is_wks=True, feat_dim=FEAT,
                    transformer_mode="wk").eval()
    ckpt = str(tmp_path / "sttran_ref.tar")
    torch.save({"state_dict": ref.state_dict(), "epoch": 1}, ckpt)

    entry, tentry = _entry_and_torch(rng)
    with torch.no_grad():
        ref_out = ref(dict(tentry))

    model = STTran(mode="sgdet", feat_dim=FEAT)
    state = _convert_and_restore(tmp_path, ckpt, model, entry)
    ours = model.apply({"params": state.params,
                        "batch_stats": state.batch_stats}, entry, train=False)
    nr = int(np.asarray(entry.rel_mask).sum())
    nb = int(np.asarray(entry.box_mask).sum())
    _compare(ours, ref_out, nr, nb)


def test_dsg_detr_checkpoint_roundtrip(tmp_path, rng):
    from tests.ref_stubs import install
    install()
    from lib.dsg_detr import STTran as RefDSG
    from nl_vsgg_tpu.models.dsg_detr import DSGDETR

    torch.manual_seed(23)
    classes = [f"c{i}" for i in range(37)]
    ref = RefDSG(mode="sgdet", attention_class_num=3, spatial_class_num=6,
                 contact_class_num=17, obj_classes=classes).eval()
    # DataParallel-style prefixes must be stripped like the reference does
    sd = {f"module.{k}": v for k, v in ref.state_dict().items()}
    ckpt = str(tmp_path / "dsg_ref.tar")
    torch.save({"state_dict": sd}, ckpt)

    entry, tentry = _entry_and_torch(rng)
    with torch.no_grad():
        ref_out = ref(dict(tentry))

    model = DSGDETR(mode="sgdet", feat_dim=FEAT)
    state = _convert_and_restore(tmp_path, ckpt, model, entry)
    ours = model.apply({"params": state.params,
                        "batch_stats": state.batch_stats}, entry, train=False)
    nr = int(np.asarray(entry.rel_mask).sum())
    nb = int(np.asarray(entry.box_mask).sum())
    _compare(ours, ref_out, nr, nb)


def test_family_detection_rejects_garbage():
    from nl_vsgg_tpu.models.convert_ref import detect_family
    with pytest.raises(ValueError, match="neither"):
        detect_family({"foo.weight": np.zeros(3)})

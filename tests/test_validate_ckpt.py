"""Checkpoint-validation harness exercised on synthetic file-backed weights:
the exact flow that will run on the real vinvl_vg_x152c4.pth / LLM_cp.pt the
moment they are present (tools/validate_ckpt.py)."""

import importlib.util
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")


def _load_tool(name):
    spec = importlib.util.spec_from_file_location(name, os.path.join(TOOLS, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
def test_vinvl_stage_diffs_on_synthetic_checkpoint(tmp_path, rng):
    """Full per-stage torch-vs-flax diff on a file-backed synthetic checkpoint
    with randomized FrozenBN stats (exercises the folding) plus attribute-head
    keys (exercises the documented skip-list)."""
    from tests.fixtures import make_vinvl_state_dict

    vc = _load_tool("validate_ckpt")
    sd = make_vinvl_state_dict(rng, randomize_bn=True)
    # attribute-head keys the converter must skip, not crash on
    sd["roi_heads.attribute.predictor.att_score.weight"] = \
        rng.standard_normal((401, 2048)).astype(np.float32)
    sd["rpn.anchor_generator.cell_anchors.0"] = np.zeros((15, 4), np.float32)
    path = str(tmp_path / "vinvl_synth.pth")
    torch.save({"model": {k: torch.as_tensor(v) for k, v in sd.items()}}, path)

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    logs = []
    diffs = vc.validate_vinvl(ckpt["model"], atol=1e-3, log=logs.append)
    assert diffs.pop("_ok") == 1.0, "\n".join(logs)
    assert set(diffs) == {"stem", "C2", "C3", "C4", "rpn_logits", "rpn_deltas",
                          "C5", "cls_score", "bbox_pred"}
    assert any("skipped 2" in line for line in logs)


@pytest.mark.slow
def test_clip_stage_diffs_on_synthetic_lora_checkpoint(tmp_path, rng):
    """DAC LLM_cp.pt flow: open_clip-style tensors + rank-4 LoRA adapters.
    Torch side applies LoRA at runtime (x A^T B^T), flax side uses the merged
    weights — agreement validates the merge itself."""
    from nl_vsgg_tpu.pipelines import clip_jax as C

    def lin(o, i, s=0.02):
        return rng.standard_normal((o, i)).astype(np.float32) * s

    sd = {}
    sd["visual.conv1.weight"] = rng.standard_normal(
        (C.VISION_WIDTH, 3, C.PATCH, C.PATCH)).astype(np.float32) * 0.02
    sd["visual.class_embedding"] = lin(1, C.VISION_WIDTH)[0]
    sd["visual.positional_embedding"] = lin(50, C.VISION_WIDTH)
    for key in ("visual.ln_pre", "visual.ln_post", "ln_final"):
        w = C.VISION_WIDTH if key.startswith("visual") else C.TEXT_WIDTH
        sd[key + ".weight"] = np.ones(w, np.float32)
        sd[key + ".bias"] = np.zeros(w, np.float32)
    # CLIP stores projections as (width, embed_dim), used as x @ proj
    sd["visual.proj"] = lin(C.VISION_WIDTH, C.EMBED_DIM)
    sd["token_embedding.weight"] = lin(C.VOCAB, C.TEXT_WIDTH)
    sd["positional_embedding"] = lin(C.CONTEXT, C.TEXT_WIDTH)
    sd["text_projection"] = lin(C.TEXT_WIDTH, C.EMBED_DIM)

    def block(p, w):
        sd[p + ".ln_1.weight"] = np.ones(w, np.float32)
        sd[p + ".ln_1.bias"] = np.zeros(w, np.float32)
        sd[p + ".ln_2.weight"] = np.ones(w, np.float32)
        sd[p + ".ln_2.bias"] = np.zeros(w, np.float32)
        sd[p + ".attn.in_proj_weight"] = lin(3 * w, w)
        sd[p + ".attn.in_proj_bias"] = np.zeros(3 * w, np.float32)
        sd[p + ".attn.out_proj.weight"] = lin(w, w)
        sd[p + ".attn.out_proj.bias"] = np.zeros(w, np.float32)
        sd[p + ".mlp.c_fc.weight"] = lin(4 * w, w)
        sd[p + ".mlp.c_fc.bias"] = np.zeros(4 * w, np.float32)
        sd[p + ".mlp.c_proj.weight"] = lin(w, 4 * w)
        sd[p + ".mlp.c_proj.bias"] = np.zeros(w, np.float32)
        # rank-4 LoRA on out_proj, c_fc, and the attention input projection
        # (all naming variants in the wild, incl. in_proj whose weight key
        # has no '.weight' suffix)
        sd[p + ".attn.out_proj.lora_A"] = lin(4, w, 0.1)
        sd[p + ".attn.out_proj.lora_B"] = lin(w, 4, 0.1)
        sd[p + ".mlp.c_fc.lora_A.weight"] = lin(4, w, 0.1)
        sd[p + ".mlp.c_fc.lora_B.weight"] = lin(4 * w, 4, 0.1)
        sd[p + ".attn.in_proj.lora_A"] = lin(4, w, 0.1)
        sd[p + ".attn.in_proj.lora_B"] = lin(3 * w, 4, 0.1)

    for i in range(C.VISION_LAYERS):
        block(f"visual.transformer.resblocks.{i}", C.VISION_WIDTH)
    for i in range(C.TEXT_LAYERS):
        block(f"transformer.resblocks.{i}", C.TEXT_WIDTH)

    path = str(tmp_path / "llm_cp_synth.pt")
    torch.save({"state_dict": {k: torch.as_tensor(v) for k, v in sd.items()}}, path)
    logs = []
    diffs = C.validate_checkpoint(path, atol=5e-3, log=logs.append)
    assert diffs.pop("_ok") == 1.0, "\n".join(logs)
    assert set(diffs) == {"visual_embed", "text_embed"}

    # an adapter spelling nobody resolves must FAIL loudly, not agree-by-skip
    sd["visual.unknown_module.lora_A"] = lin(4, C.VISION_WIDTH, 0.1)
    path2 = str(tmp_path / "llm_cp_orphan.pt")
    torch.save({"state_dict": {k: torch.as_tensor(v) for k, v in sd.items()}}, path2)
    logs2 = []
    diffs2 = C.validate_checkpoint(path2, atol=5e-3, log=logs2.append)
    assert diffs2["_ok"] == 0.0
    assert diffs2["unconsumed_lora_keys"] == 1.0


def test_lora_merge_changes_weights(rng):
    """The merged kernel must differ from the base weight when adapters are
    present (guards against the merge silently not applying)."""
    from nl_vsgg_tpu.pipelines.clip_jax import _merge_lora

    w = rng.standard_normal((8, 8)).astype(np.float32)
    sd = {"x.weight": w,
          "x.lora_A": rng.standard_normal((2, 8)).astype(np.float32),
          "x.lora_B": rng.standard_normal((8, 2)).astype(np.float32)}
    merged = _merge_lora(sd, "x.weight")
    assert not np.allclose(merged, w)
    np.testing.assert_allclose(merged, w + sd["x.lora_B"] @ sd["x.lora_A"], rtol=1e-6)

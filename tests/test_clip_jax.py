"""CLIP-JAX (DAC) tests: residual-block parity vs a torch mirror of CLIP's
ResidualAttentionBlock, LoRA merging, and converter/encoder round-trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nl_vsgg_tpu.pipelines import clip_jax as C

torch = pytest.importorskip("torch")


class TorchCLIPBlock(torch.nn.Module):
    """openai-CLIP ResidualAttentionBlock (pre-norm, quick-gelu)."""

    def __init__(self, width, heads):
        super().__init__()
        self.attn = torch.nn.MultiheadAttention(width, heads)
        self.ln_1 = torch.nn.LayerNorm(width)
        self.mlp = torch.nn.Sequential()
        self.mlp.c_fc = torch.nn.Linear(width, width * 4)
        self.mlp.c_proj = torch.nn.Linear(width * 4, width)
        self.ln_2 = torch.nn.LayerNorm(width)

    def forward(self, x, causal=False):
        L = x.shape[0]
        mask = None
        if causal:
            mask = torch.full((L, L), float("-inf")).triu(1)
        h = self.ln_1(x)
        h = self.attn(h, h, h, need_weights=False, attn_mask=mask)[0]
        x = x + h
        h = self.ln_2(x)
        h = self.mlp.c_proj(h.matmul(self.mlp.c_fc.weight.T) + self.mlp.c_fc.bias)
        # quick gelu applied inside CLIP's MLP between fc and proj
        return x + h


class TorchCLIPBlockQuickGelu(TorchCLIPBlock):
    def forward(self, x, causal=False):
        L = x.shape[0]
        mask = None
        if causal:
            mask = torch.full((L, L), float("-inf")).triu(1)
        h = self.ln_1(x)
        h = self.attn(h, h, h, need_weights=False, attn_mask=mask)[0]
        x = x + h
        h = self.ln_2(x)
        h = self.mlp.c_fc(h)
        h = h * torch.sigmoid(1.702 * h)
        h = self.mlp.c_proj(h)
        return x + h


def _sd_from_block(tb, prefix):
    sd = {}
    sd[f"{prefix}.attn.in_proj_weight"] = tb.attn.in_proj_weight.detach().numpy()
    sd[f"{prefix}.attn.in_proj_bias"] = tb.attn.in_proj_bias.detach().numpy()
    sd[f"{prefix}.attn.out_proj.weight"] = tb.attn.out_proj.weight.detach().numpy()
    sd[f"{prefix}.attn.out_proj.bias"] = tb.attn.out_proj.bias.detach().numpy()
    for ln in ("ln_1", "ln_2"):
        m = getattr(tb, ln)
        sd[f"{prefix}.{ln}.weight"] = m.weight.detach().numpy()
        sd[f"{prefix}.{ln}.bias"] = m.bias.detach().numpy()
    sd[f"{prefix}.mlp.c_fc.weight"] = tb.mlp.c_fc.weight.detach().numpy()
    sd[f"{prefix}.mlp.c_fc.bias"] = tb.mlp.c_fc.bias.detach().numpy()
    sd[f"{prefix}.mlp.c_proj.weight"] = tb.mlp.c_proj.weight.detach().numpy()
    sd[f"{prefix}.mlp.c_proj.bias"] = tb.mlp.c_proj.bias.detach().numpy()
    return sd


@pytest.mark.parametrize("causal", [False, True])
def test_residual_block_parity(rng, causal):
    W, H, L = 64, 4, 9
    torch.manual_seed(0)
    tb = TorchCLIPBlockQuickGelu(W, H).eval()
    x = rng.standard_normal((L, 1, W)).astype(np.float32)
    with torch.no_grad():
        ref = tb(torch.as_tensor(x), causal=causal).numpy()[:, 0]
    sd = _sd_from_block(tb, "blk")
    params = C._block_params(sd, "blk", W, 1.0)
    blk = C.ResidualBlock(W, H, causal=causal)
    got = blk.apply({"params": params}, jnp.asarray(x[:, 0][None]))[0]
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5)


def test_lora_merge(rng):
    W = 16
    sd = {"m.weight": rng.standard_normal((W, W)).astype(np.float32)}
    out = C._merge_lora(sd, "m.weight")
    np.testing.assert_array_equal(out, sd["m.weight"])
    sd["m.lora_A"] = rng.standard_normal((4, W)).astype(np.float32)
    sd["m.lora_B"] = rng.standard_normal((W, 4)).astype(np.float32)
    merged = C._merge_lora(sd, "m.weight", scale=0.5)
    np.testing.assert_allclose(
        merged, sd["m.weight"] + 0.5 * sd["m.lora_B"] @ sd["m.lora_A"], rtol=1e-6)


@pytest.mark.slow
def test_full_converter_and_encoders(rng):
    """Synthetic full-size CLIP state dict converts and both towers run."""
    sd = {}
    sd["visual.conv1.weight"] = rng.standard_normal(
        (C.VISION_WIDTH, 3, C.PATCH, C.PATCH)).astype(np.float32) * 0.01
    sd["visual.class_embedding"] = rng.standard_normal(C.VISION_WIDTH).astype(np.float32)
    n_pos = (C.IMAGE_SIZE // C.PATCH) ** 2 + 1
    sd["visual.positional_embedding"] = rng.standard_normal(
        (n_pos, C.VISION_WIDTH)).astype(np.float32) * 0.01
    for ln in ("visual.ln_pre", "visual.ln_post"):
        sd[ln + ".weight"] = np.ones(C.VISION_WIDTH, np.float32)
        sd[ln + ".bias"] = np.zeros(C.VISION_WIDTH, np.float32)
    sd["visual.proj"] = rng.standard_normal(
        (C.VISION_WIDTH, C.EMBED_DIM)).astype(np.float32) * 0.01

    def blk(prefix, w):
        sd[f"{prefix}.attn.in_proj_weight"] = rng.standard_normal((3 * w, w)).astype(np.float32) * 0.02
        sd[f"{prefix}.attn.in_proj_bias"] = np.zeros(3 * w, np.float32)
        sd[f"{prefix}.attn.out_proj.weight"] = rng.standard_normal((w, w)).astype(np.float32) * 0.02
        sd[f"{prefix}.attn.out_proj.bias"] = np.zeros(w, np.float32)
        for ln in ("ln_1", "ln_2"):
            sd[f"{prefix}.{ln}.weight"] = np.ones(w, np.float32)
            sd[f"{prefix}.{ln}.bias"] = np.zeros(w, np.float32)
        sd[f"{prefix}.mlp.c_fc.weight"] = rng.standard_normal((4 * w, w)).astype(np.float32) * 0.02
        sd[f"{prefix}.mlp.c_fc.bias"] = np.zeros(4 * w, np.float32)
        sd[f"{prefix}.mlp.c_proj.weight"] = rng.standard_normal((w, 4 * w)).astype(np.float32) * 0.02
        sd[f"{prefix}.mlp.c_proj.bias"] = np.zeros(w, np.float32)

    for i in range(C.VISION_LAYERS):
        blk(f"visual.transformer.resblocks.{i}", C.VISION_WIDTH)
    for i in range(C.TEXT_LAYERS):
        blk(f"transformer.resblocks.{i}", C.TEXT_WIDTH)
    sd["token_embedding.weight"] = rng.standard_normal(
        (C.VOCAB, C.TEXT_WIDTH)).astype(np.float32) * 0.01
    sd["positional_embedding"] = rng.standard_normal(
        (C.CONTEXT, C.TEXT_WIDTH)).astype(np.float32) * 0.01
    sd["ln_final.weight"] = np.ones(C.TEXT_WIDTH, np.float32)
    sd["ln_final.bias"] = np.zeros(C.TEXT_WIDTH, np.float32)
    sd["text_projection"] = rng.standard_normal(
        (C.TEXT_WIDTH, C.EMBED_DIM)).astype(np.float32) * 0.01

    vis, txt = C.convert_clip_state_dict(sd)
    images = rng.uniform(-1, 1, (2, C.IMAGE_SIZE, C.IMAGE_SIZE, 3)).astype(np.float32)
    tokens = np.zeros((3, C.CONTEXT), np.int64)
    tokens[:, 0] = 1
    tokens[np.arange(3), [5, 9, 12]] = C.VOCAB - 1  # EOT at different positions
    frames, texts = C.encode_for_adv(vis, txt, images, [tokens])
    assert frames.shape == (2, C.EMBED_DIM)
    assert texts[0].shape == (3, C.EMBED_DIM)
    np.testing.assert_allclose(np.linalg.norm(frames, axis=1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(texts[0], axis=1), 1.0, rtol=1e-5)
    # the alignment math consumes these directly
    from nl_vsgg_tpu.pipelines.adv import align_video
    mapped = align_video([texts[0]], np.repeat(frames, 4, 0), beta=4)
    assert len(mapped) == 3

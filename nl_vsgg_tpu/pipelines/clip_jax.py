"""CLIP ViT-B/32 (the DAC VLM) in flax, with LoRA weight merging.

The reference's ADV stage encodes captions and frames with DAC — open_clip
ViT-B/32 plus rank-4 LoRA adapters loaded from LLM_cp.pt
(NL-VSGG/ADV.py:30-52). This module provides:

  * `CLIPTextEncoder` / `CLIPImageEncoder` — the standard CLIP ViT-B/32
    towers (pre-norm transformer, quick-gelu, causal text mask, EOT pooling,
    learned projections), NHWC image patches via a 32x32 conv.
  * `convert_clip_state_dict` — torch CLIP/open_clip state dict -> flax
    params, *merging* LoRA adapters (W <- W + scale * B @ A) at conversion
    time so inference runs dense on the MXU with zero adapter overhead.
  * `encode_for_adv` — unit-normalized text/frame embeddings in the exact
    form pipelines/adv.py consumes.

CLIP's BPE tokenizer depends on the vocabulary file shipped with
openai/CLIP; `SimpleTokenizer` loads it when available (path argument) — the
alignment math itself is tokenizer-agnostic (it consumes embeddings).
"""

from __future__ import annotations

from typing import Any, Mapping

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

EMBED_DIM = 512
VISION_WIDTH = 768
VISION_LAYERS = 12
VISION_HEADS = 12
PATCH = 32
IMAGE_SIZE = 224
TEXT_WIDTH = 512
TEXT_LAYERS = 12
TEXT_HEADS = 8
CONTEXT = 77
VOCAB = 49408


def quick_gelu(x):
    return x * nn.sigmoid(1.702 * x)


class ResidualBlock(nn.Module):
    width: int
    heads: int
    causal: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        L = x.shape[-2]
        h = nn.LayerNorm(name="ln_1")(x)
        mask = None
        if self.causal:
            mask = jnp.tril(jnp.ones((L, L), bool))
        from ..models.layers import MaskedMHA
        allow = mask if mask is not None else jnp.ones((L, L), bool)
        h = MaskedMHA(self.width, self.heads, name="attn")(h, h, h, allow)
        x = x + h
        h = nn.LayerNorm(name="ln_2")(x)
        h = nn.Dense(self.width * 4, name="mlp_fc")(h)
        h = quick_gelu(h)
        h = nn.Dense(self.width, name="mlp_proj")(h)
        return x + h


class CLIPImageEncoder(nn.Module):
    """ViT-B/32 visual tower -> (B, EMBED_DIM)."""

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        B = images.shape[0]
        x = nn.Conv(VISION_WIDTH, (PATCH, PATCH), strides=PATCH, use_bias=False,
                    name="patch_embed")(images)          # (B, 7, 7, W)
        x = x.reshape(B, -1, VISION_WIDTH)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (VISION_WIDTH,))
        x = jnp.concatenate([jnp.tile(cls, (B, 1, 1)), x], axis=1)
        pos = self.param("positional_embedding", nn.initializers.normal(0.02),
                         (x.shape[1], VISION_WIDTH))
        x = x + pos
        x = nn.LayerNorm(name="ln_pre")(x)
        for i in range(VISION_LAYERS):
            x = ResidualBlock(VISION_WIDTH, VISION_HEADS, name=f"block_{i}")(x)
        x = nn.LayerNorm(name="ln_post")(x[:, 0])
        proj = self.param("proj", nn.initializers.normal(0.02),
                          (VISION_WIDTH, EMBED_DIM))
        return x @ proj


class CLIPTextEncoder(nn.Module):
    """Text tower: token ids (B, 77) -> (B, EMBED_DIM), EOT pooling."""

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        emb = self.param("token_embedding", nn.initializers.normal(0.02),
                         (VOCAB, TEXT_WIDTH))
        pos = self.param("positional_embedding", nn.initializers.normal(0.01),
                         (CONTEXT, TEXT_WIDTH))
        x = emb[tokens] + pos[:tokens.shape[-1]]
        for i in range(TEXT_LAYERS):
            x = ResidualBlock(TEXT_WIDTH, TEXT_HEADS, causal=True,
                              name=f"block_{i}")(x)
        x = nn.LayerNorm(name="ln_final")(x)
        # EOT token = highest id in each row (CLIP convention)
        eot = tokens.argmax(axis=-1)
        pooled = x[jnp.arange(x.shape[0]), eot]
        proj = self.param("text_projection", nn.initializers.normal(0.02),
                          (TEXT_WIDTH, EMBED_DIM))
        return pooled @ proj


# ---------------- weight conversion (with LoRA merging) ----------------

def _lora_key_pairs(key: str) -> list[tuple[str, str]]:
    """Candidate (lora_A, lora_B) key names for a weight tensor `key`.

    Covers both '<stem>.lora_A' and '<stem>.lora_A.weight' spellings, and the
    attention input projection whose tensor is named 'in_proj_weight' (no
    '.weight' suffix) but whose adapters live under 'in_proj.lora_A'.
    """
    stems = []
    if key.endswith(".weight"):
        stems.append(key[: -len(".weight")])
    if key.endswith("in_proj_weight"):
        stems.append(key[: -len("_weight")])  # ...attn.in_proj
    out = []
    for s in stems:
        out.append((s + ".lora_A", s + ".lora_B"))
        out.append((s + ".lora_A.weight", s + ".lora_B.weight"))
    return out


def _merge_lora(sd: Mapping[str, Any], key: str, scale: float = 1.0) -> np.ndarray:
    """W + scale * (lora_B @ lora_A) when adapters exist for `key`."""
    w = np.asarray(sd[key], np.float32)
    for ak, bk in _lora_key_pairs(key):
        if ak in sd and bk in sd:
            a = np.asarray(sd[ak], np.float32)
            b = np.asarray(sd[bk], np.float32)
            return w + scale * (b @ a)
    return w


def _block_params(sd, p, width, lora_scale):
    """One transformer residual block from CLIP naming."""
    in_w = _merge_lora(sd, f"{p}.attn.in_proj_weight", lora_scale)
    in_b = np.asarray(sd[f"{p}.attn.in_proj_bias"], np.float32)
    qw, kw, vw = np.split(in_w, 3, 0)
    qb, kb, vb = np.split(in_b, 3, 0)
    return {
        "ln_1": {"scale": np.asarray(sd[f"{p}.ln_1.weight"]),
                 "bias": np.asarray(sd[f"{p}.ln_1.bias"])},
        "attn": {
            "q_proj": {"kernel": qw.T, "bias": qb},
            "k_proj": {"kernel": kw.T, "bias": kb},
            "v_proj": {"kernel": vw.T, "bias": vb},
            "out_proj": {"kernel": _merge_lora(sd, f"{p}.attn.out_proj.weight",
                                               lora_scale).T,
                         "bias": np.asarray(sd[f"{p}.attn.out_proj.bias"])},
        },
        "ln_2": {"scale": np.asarray(sd[f"{p}.ln_2.weight"]),
                 "bias": np.asarray(sd[f"{p}.ln_2.bias"])},
        "mlp_fc": {"kernel": _merge_lora(sd, f"{p}.mlp.c_fc.weight", lora_scale).T,
                   "bias": np.asarray(sd[f"{p}.mlp.c_fc.bias"])},
        "mlp_proj": {"kernel": _merge_lora(sd, f"{p}.mlp.c_proj.weight", lora_scale).T,
                     "bias": np.asarray(sd[f"{p}.mlp.c_proj.bias"])},
    }


def convert_clip_state_dict(sd: Mapping[str, Any], lora_scale: float = 1.0):
    """openai-CLIP-style state dict (optionally with LoRA adapters) ->
    (visual_params, text_params)."""
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    visual = {
        "patch_embed": {"kernel": np.asarray(
            sd["visual.conv1.weight"], np.float32).transpose(2, 3, 1, 0)},
        "class_embedding": np.asarray(sd["visual.class_embedding"], np.float32),
        "positional_embedding": np.asarray(sd["visual.positional_embedding"], np.float32),
        "ln_pre": {"scale": np.asarray(sd["visual.ln_pre.weight"]),
                   "bias": np.asarray(sd["visual.ln_pre.bias"])},
        "ln_post": {"scale": np.asarray(sd["visual.ln_post.weight"]),
                    "bias": np.asarray(sd["visual.ln_post.bias"])},
        "proj": np.asarray(sd["visual.proj"], np.float32),
    }
    for i in range(VISION_LAYERS):
        visual[f"block_{i}"] = _block_params(
            sd, f"visual.transformer.resblocks.{i}", VISION_WIDTH, lora_scale)
    text = {
        "token_embedding": np.asarray(sd["token_embedding.weight"], np.float32),
        "positional_embedding": np.asarray(sd["positional_embedding"], np.float32),
        "ln_final": {"scale": np.asarray(sd["ln_final.weight"]),
                     "bias": np.asarray(sd["ln_final.bias"])},
        "text_projection": np.asarray(sd["text_projection"], np.float32),
    }
    for i in range(TEXT_LAYERS):
        text[f"block_{i}"] = _block_params(
            sd, f"transformer.resblocks.{i}", TEXT_WIDTH, lora_scale)
    return visual, text


# ---------------- checkpoint validation (tools/validate_ckpt.py) ----------

def _t_linear_lora(x, sd, key, scale):
    """torch linear applying LoRA the way the DAC runtime does:
    y = x W^T + b + scale * (x A^T) B^T  — NOT via a pre-merged weight, so a
    conversion-side merge bug cannot cancel out. Shares _lora_key_pairs with
    the converter so both sides resolve adapters identically; the coverage
    check in validate_checkpoint catches adapter keys NEITHER side consumed."""
    import torch.nn.functional as F
    w = sd[key]
    # 'in_proj_weight' has no '.weight' suffix: its bias is added by the caller
    b = sd.get(key[:-7] + ".bias") if key.endswith(".weight") else None
    y = F.linear(x, w, b)
    for ak, bk in _lora_key_pairs(key):
        if ak in sd and bk in sd:
            y = y + scale * F.linear(F.linear(x, sd[ak]), sd[bk])
            break
    return y


def _t_block(x, sd, p, heads, causal, scale):
    import torch
    import torch.nn.functional as F

    def ln(v, key):
        return F.layer_norm(v, (v.shape[-1],), sd[key + ".weight"], sd[key + ".bias"])

    B, L, D = x.shape
    h = ln(x, p + ".ln_1")
    qkv = _t_linear_lora(h, sd, p + ".attn.in_proj_weight", scale)
    # in_proj bias lives under a different key than .weight->.bias mapping
    if p + ".attn.in_proj_bias" in sd:
        qkv = qkv + sd[p + ".attn.in_proj_bias"]
    q, k, v = qkv.chunk(3, -1)
    hd = D // heads
    q = q.view(B, L, heads, hd).transpose(1, 2)
    k = k.view(B, L, heads, hd).transpose(1, 2)
    v = v.view(B, L, heads, hd).transpose(1, 2)
    att = (q @ k.transpose(-2, -1)) / hd ** 0.5
    if causal:
        att = att.masked_fill(~torch.tril(torch.ones(L, L, dtype=torch.bool)), float("-inf"))
    o = (att.softmax(-1) @ v).transpose(1, 2).reshape(B, L, D)
    o = _t_linear_lora(o, sd, p + ".attn.out_proj.weight", scale)
    x = x + o
    h = ln(x, p + ".ln_2")
    h = _t_linear_lora(h, sd, p + ".mlp.c_fc.weight", scale)
    h = h * torch.sigmoid(1.702 * h)
    h = _t_linear_lora(h, sd, p + ".mlp.c_proj.weight", scale)
    return x + h


def validate_checkpoint(path: str, atol: float = 5e-3, lora_scale: float = 1.0,
                        log=print) -> dict[str, float]:
    """Per-stage activation diff: functional-torch evaluation of the raw
    LLM_cp.pt tensors (LoRA applied at runtime, as DAC does) vs the converted
    flax towers (LoRA merged at conversion). Returns {stage: max_abs_diff,
    '_ok': 0/1}."""
    import torch
    import torch.nn.functional as F

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt.get("state_dict", ckpt))
    sd = {k.removeprefix("module."): torch.as_tensor(np.asarray(v)).float()
          for k, v in sd.items()}
    visual_params, text_params = convert_clip_state_dict(
        {k: v.numpy() for k, v in sd.items()}, lora_scale)

    # adapter-coverage check: an adapter spelling neither side resolves would
    # make both sides agree while diverging from the DAC runtime
    consumable: set = set()
    for k in sd:
        for ak, bk in _lora_key_pairs(k):
            consumable.add(ak)
            consumable.add(bk)
    orphans = sorted(k for k in sd if ".lora_" in k and k not in consumable)

    rng = np.random.default_rng(0)
    images = rng.standard_normal((2, IMAGE_SIZE, IMAGE_SIZE, 3)).astype(np.float32)
    tokens = np.zeros((2, CONTEXT), np.int64)
    tokens[:, 0] = 49406
    tokens[0, 1:5] = rng.integers(1, 49000, 4)
    tokens[0, 5] = 49407
    tokens[1, 1:9] = rng.integers(1, 49000, 8)
    tokens[1, 9] = 49407

    diffs: dict[str, float] = {}
    with torch.no_grad():
        # --- visual tower
        x = torch.as_tensor(np.moveaxis(images, -1, 1))
        x = F.conv2d(x, sd["visual.conv1.weight"], stride=PATCH)
        x = x.flatten(2).transpose(1, 2)
        cls = sd["visual.class_embedding"].expand(x.shape[0], 1, -1)
        x = torch.cat([cls, x], 1) + sd["visual.positional_embedding"]
        x = F.layer_norm(x, (x.shape[-1],), sd["visual.ln_pre.weight"],
                         sd["visual.ln_pre.bias"])
        for i in range(VISION_LAYERS):
            x = _t_block(x, sd, f"visual.transformer.resblocks.{i}",
                         VISION_HEADS, False, lora_scale)
        x = F.layer_norm(x[:, 0], (x.shape[-1],), sd["visual.ln_post.weight"],
                         sd["visual.ln_post.bias"])
        ref_v = (x @ sd["visual.proj"]).numpy()
        # --- text tower
        t = sd["token_embedding.weight"][torch.as_tensor(tokens)] + \
            sd["positional_embedding"]
        for i in range(TEXT_LAYERS):
            t = _t_block(t, sd, f"transformer.resblocks.{i}",
                         TEXT_HEADS, True, lora_scale)
        t = F.layer_norm(t, (t.shape[-1],), sd["ln_final.weight"], sd["ln_final.bias"])
        pooled = t[torch.arange(2), torch.as_tensor(tokens).argmax(-1)]
        ref_t = (pooled @ sd["text_projection"]).numpy()

    got_v = np.asarray(CLIPImageEncoder().apply({"params": visual_params},
                                                jnp.asarray(images)))
    got_t = np.asarray(CLIPTextEncoder().apply({"params": text_params},
                                               jnp.asarray(tokens)))
    ok = True
    for stage, ref, got in (("visual_embed", ref_v, got_v),
                            ("text_embed", ref_t, got_t)):
        d = float(np.abs(ref - got).max())
        scale = float(np.abs(ref).max()) or 1.0
        diffs[stage] = d
        status = "ok" if d <= atol * max(1.0, scale) else "FAIL"
        ok &= status == "ok"
        log(f"  {stage:<14} max|Δ| = {d:.3e}  (|ref|max {scale:.2e})  {status}")
    if orphans:
        ok = False
        diffs["unconsumed_lora_keys"] = float(len(orphans))
        log(f"  FAIL: {len(orphans)} LoRA adapter keys resolve to no weight "
            f"(first: {orphans[0]}) — merge would silently skip them")
    diffs["_ok"] = float(ok)
    return diffs


def encode_for_adv(visual_params, text_params, images: np.ndarray,
                   token_batches: list[np.ndarray]):
    """-> (frame_embeddings (T, 512), [sentence_embeddings (S_i, 512)]),
    unit-normalized like ADV.py:104-118."""
    img_enc = CLIPImageEncoder()
    txt_enc = CLIPTextEncoder()
    vf = img_enc.apply({"params": visual_params}, jnp.asarray(images))
    vf = vf / jnp.linalg.norm(vf, axis=-1, keepdims=True)
    outs = []
    for toks in token_batches:
        tf = txt_enc.apply({"params": text_params}, jnp.asarray(toks))
        tf = tf / jnp.linalg.norm(tf, axis=-1, keepdims=True)
        outs.append(np.asarray(tf))
    return np.asarray(vf), outs

"""CLIP (vision + text towers) in flax — differentiable guidance.

The reference backprops through CLIP ViT-B/16 for text-to-3D guidance
(nerf/clip_utils.py:20-63, nerf/utils.py:473-488). This is the same
architecture as HuggingFace ``CLIPModel`` (pre-LN transformer, quickgelu
MLPs, causal text tower, EOT pooling, linear projections) as pure flax:
jittable, differentiable, bf16-capable on the MXU. ``load_hf_clip``
converts a locally provided HF checkpoint (transformers parses weights;
no network access in this image).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# CLIP pixel normalization (openai/clip-vit-base-patch16 processor)
IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    image_size: int = 224
    patch_size: int = 16
    vision_width: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    text_width: int = 512
    text_layers: int = 12
    text_heads: int = 8
    vocab_size: int = 49408
    context_length: int = 77
    embed_dim: int = 512

    @classmethod
    def tiny(cls) -> "CLIPConfig":
        """Architecture-faithful miniature for tests."""
        return cls(
            image_size=32, patch_size=8, vision_width=32, vision_layers=2,
            vision_heads=2, text_width=32, text_layers=2, text_heads=2,
            vocab_size=64, context_length=16, embed_dim=16,
        )


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class _Attention(nn.Module):
    width: int
    heads: int

    @nn.compact
    def __call__(self, x, mask=None):
        B, T, _ = x.shape
        hd = self.width // self.heads
        q = nn.Dense(self.width, name="q_proj")(x)
        k = nn.Dense(self.width, name="k_proj")(x)
        v = nn.Dense(self.width, name="v_proj")(x)
        q = q.reshape(B, T, self.heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, T, self.heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, T, self.heads, hd).transpose(0, 2, 1, 3)
        att = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(hd)
        if mask is not None:
            att = att + mask
        att = jax.nn.softmax(att, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, self.width)
        return nn.Dense(self.width, name="out_proj")(out)


class _Block(nn.Module):
    width: int
    heads: int

    @nn.compact
    def __call__(self, x, mask=None):
        x = x + _Attention(self.width, self.heads, name="self_attn")(
            nn.LayerNorm(epsilon=1e-5, name="layer_norm1")(x), mask
        )
        h = nn.LayerNorm(epsilon=1e-5, name="layer_norm2")(x)
        h = nn.Dense(4 * self.width, name="fc1")(h)
        h = quick_gelu(h)
        h = nn.Dense(self.width, name="fc2")(h)
        return x + h


class VisionTower(nn.Module):
    cfg: CLIPConfig

    @nn.compact
    def __call__(self, pixels):
        """pixels: [B, S, S, 3] normalized -> [B, embed_dim]."""
        c = self.cfg
        B = pixels.shape[0]
        h = nn.Conv(
            c.vision_width, (c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size), use_bias=False,
            name="patch_embedding",
        )(pixels)
        h = h.reshape(B, -1, c.vision_width)
        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02), (c.vision_width,)
        )
        h = jnp.concatenate([jnp.tile(cls, (B, 1, 1)), h], axis=1)
        n_pos = (c.image_size // c.patch_size) ** 2 + 1
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.02),
            (n_pos, c.vision_width),
        )
        h = h + pos[None]
        h = nn.LayerNorm(epsilon=1e-5, name="pre_layrnorm")(h)  # (sic — HF key name)
        for i in range(c.vision_layers):
            h = _Block(c.vision_width, c.vision_heads, name=f"layers_{i}")(h)
        pooled = nn.LayerNorm(epsilon=1e-5, name="post_layernorm")(h[:, 0])
        return nn.Dense(c.embed_dim, use_bias=False, name="visual_projection")(pooled)


class TextTower(nn.Module):
    cfg: CLIPConfig

    @nn.compact
    def __call__(self, ids):
        """ids: [B, T] int32 token ids -> [B, embed_dim] (EOT pooled)."""
        c = self.cfg
        T = ids.shape[1]
        tok = nn.Embed(c.vocab_size, c.text_width, name="token_embedding")(ids)
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.02),
            (c.context_length, c.text_width),
        )
        h = tok + pos[None, :T]
        mask = jnp.triu(jnp.full((T, T), -jnp.inf), k=1)[None, None]
        for i in range(c.text_layers):
            h = _Block(c.text_width, c.text_heads, name=f"layers_{i}")(h, mask)
        h = nn.LayerNorm(epsilon=1e-5, name="final_layer_norm")(h)
        # EOT token has the highest id in CLIP's vocab
        eot = jnp.argmax(ids, axis=-1)
        pooled = jnp.take_along_axis(h, eot[:, None, None], axis=1)[:, 0]
        return nn.Dense(c.embed_dim, use_bias=False, name="text_projection")(pooled)


class CLIP(nn.Module):
    cfg: CLIPConfig

    def setup(self):
        self.vision = VisionTower(self.cfg)
        self.text = TextTower(self.cfg)

    def encode_image(self, pixels):
        return self.vision(pixels)

    def encode_text(self, ids):
        return self.text(ids)

    def __call__(self, pixels, ids):
        ie = self.encode_image(pixels)
        te = self.encode_text(ids)
        return ie, te


def preprocess(images: jnp.ndarray, cfg: CLIPConfig) -> jnp.ndarray:
    """[B, H, W, 3] in [0, 1] -> resized + normalized, differentiable."""
    B = images.shape[0]
    x = jax.image.resize(
        images, (B, cfg.image_size, cfg.image_size, 3), "bilinear"
    )
    return (x - jnp.asarray(IMAGE_MEAN)) / jnp.asarray(IMAGE_STD)


def _dense(w, b=None):
    out = {"kernel": np.asarray(w).T.astype(np.float32)}
    if b is not None:
        out["bias"] = np.asarray(b).astype(np.float32)
    return out


def load_hf_clip(model_path: str) -> Tuple[CLIPConfig, dict]:
    """Convert a local HuggingFace CLIP checkpoint to (config, params).

    transformers is used only to parse the checkpoint; everything runs
    in flax afterwards. cite: nerf/clip_utils.py loads the torch hub
    ViT-B/16 — here any HF CLIPModel checkout works.
    """
    from transformers import CLIPModel

    m = CLIPModel.from_pretrained(model_path)
    hc = m.config
    cfg = CLIPConfig(
        image_size=hc.vision_config.image_size,
        patch_size=hc.vision_config.patch_size,
        vision_width=hc.vision_config.hidden_size,
        vision_layers=hc.vision_config.num_hidden_layers,
        vision_heads=hc.vision_config.num_attention_heads,
        text_width=hc.text_config.hidden_size,
        text_layers=hc.text_config.num_hidden_layers,
        text_heads=hc.text_config.num_attention_heads,
        vocab_size=hc.text_config.vocab_size,
        context_length=hc.text_config.max_position_embeddings,
        embed_dim=hc.projection_dim,
    )
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}

    def block(prefix):
        out = {}
        out["self_attn"] = {
            n: _dense(sd[f"{prefix}.self_attn.{n}.weight"],
                      sd[f"{prefix}.self_attn.{n}.bias"])
            for n in ("q_proj", "k_proj", "v_proj", "out_proj")
        }
        for ln in ("layer_norm1", "layer_norm2"):
            out[ln] = {"scale": sd[f"{prefix}.{ln}.weight"],
                       "bias": sd[f"{prefix}.{ln}.bias"]}
        out["fc1"] = _dense(sd[f"{prefix}.mlp.fc1.weight"], sd[f"{prefix}.mlp.fc1.bias"])
        out["fc2"] = _dense(sd[f"{prefix}.mlp.fc2.weight"], sd[f"{prefix}.mlp.fc2.bias"])
        return out

    vis = {
        # torch conv OIHW -> flax HWIO
        "patch_embedding": {
            "kernel": np.transpose(
                sd["vision_model.embeddings.patch_embedding.weight"], (2, 3, 1, 0)
            ).astype(np.float32)
        },
        "class_embedding": sd["vision_model.embeddings.class_embedding"],
        "position_embedding": sd["vision_model.embeddings.position_embedding.weight"],
        "pre_layrnorm": {"scale": sd["vision_model.pre_layrnorm.weight"],
                         "bias": sd["vision_model.pre_layrnorm.bias"]},
        "post_layernorm": {"scale": sd["vision_model.post_layernorm.weight"],
                           "bias": sd["vision_model.post_layernorm.bias"]},
        "visual_projection": {"kernel": sd["visual_projection.weight"].T.astype(np.float32)},
    }
    for i in range(cfg.vision_layers):
        vis[f"layers_{i}"] = block(f"vision_model.encoder.layers.{i}")
    txt = {
        "token_embedding": {"embedding": sd["text_model.embeddings.token_embedding.weight"]},
        "position_embedding": sd["text_model.embeddings.position_embedding.weight"],
        "final_layer_norm": {"scale": sd["text_model.final_layer_norm.weight"],
                             "bias": sd["text_model.final_layer_norm.bias"]},
        "text_projection": {"kernel": sd["text_projection.weight"].T.astype(np.float32)},
    }
    for i in range(cfg.text_layers):
        txt[f"layers_{i}"] = block(f"text_model.encoder.layers.{i}")
    params = {"params": {"vision": vis, "text": txt}}
    return cfg, jax.tree_util.tree_map(jnp.asarray, params)

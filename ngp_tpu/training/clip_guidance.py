"""CLIP-guided text-to-3D loss.

TPU-native equivalent of the reference's ``nerf/clip_utils.py``
(`CLIPLoss`): renders from random poses (``rand_pose`` mode,
provider.py:277-296) are scored by negative cosine similarity between
CLIP image embeddings and a text embedding (clip_utils.py:20-63).

The CLIP towers are flax (ngp_tpu.models.clip) so the loss is
jit-traceable and DIFFERENTIABLE — guidance training backprops through
CLIP exactly like the reference. Pretrained weights cannot be
downloaded in this offline image; pass ``model_path`` pointing at a
local HuggingFace checkout (transformers parses the weights once on
the host). Without weights the class raises a clear error at
construction, and ``GradientImageLoss`` provides a dependency-free
stand-in with the same interface so the random-pose rendering path
stays testable.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np


class CLIPLoss:
    """Differentiable CLIP guidance: the flax CLIP towers
    (ngp_tpu.models.clip) run the image encoder INSIDE the jitted
    guidance step, so gradients flow render → CLIP → cosine loss
    exactly like the reference's torch path (utils.py:473-488).

    Construction options:
    - ``model_path``: local HF 'openai/clip-vit-base-patch16' checkout
      (weights + tokenizer parsed once on the host).
    - ``clip_cfg``/``params``/``token_ids``: pre-built flax config,
      variables, and tokenized prompt (tests use CLIPConfig.tiny()).
    """

    def __init__(
        self,
        text: str,
        model_path: Optional[str] = None,
        clip_cfg=None,
        params=None,
        token_ids=None,
    ):
        from ngp_tpu.models.clip import CLIP, CLIPConfig, load_hf_clip

        if model_path is not None:
            clip_cfg, params = load_hf_clip(model_path)
            from transformers import CLIPTokenizer

            tok = CLIPTokenizer.from_pretrained(model_path)
            token_ids = np.asarray(
                tok([text], padding="max_length",
                    max_length=clip_cfg.context_length,
                    truncation=True)["input_ids"],
                np.int32,
            )
        if clip_cfg is None or params is None or token_ids is None:
            raise RuntimeError(
                "CLIP guidance needs pretrained weights; pass model_path= to "
                "a local 'openai/clip-vit-base-patch16' checkout, or supply "
                "clip_cfg/params/token_ids directly (no network access in "
                "this image)."
            )
        self.cfg = clip_cfg
        self.model = CLIP(clip_cfg)
        self.params = params
        import jax

        te = self.model.apply(
            params, jnp.asarray(token_ids), method=CLIP.encode_text
        )
        te = te / jnp.linalg.norm(te, axis=-1, keepdims=True)
        self.text_features = jax.lax.stop_gradient(te)  # [1, E]

    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """images: [B, H, W, 3] in [0, 1] → scalar loss. jit-traceable
        and differentiable (clip_utils.py:50-63)."""
        from ngp_tpu.models.clip import CLIP, preprocess

        x = preprocess(images, self.cfg)
        emb = self.model.apply(self.params, x, method=CLIP.encode_image)
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
        sim = emb @ self.text_features.T  # [B, 1]
        return -jnp.mean(sim)


class GradientImageLoss:
    """Weight-free stand-in with the CLIPLoss interface: encourages
    smooth, colorful renders (negative mean saturation + TV). Used by
    tests to exercise the random-pose guidance path end-to-end."""

    def __init__(self, text: str = ""):
        self.text = text

    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        sat = jnp.max(images, axis=-1) - jnp.min(images, axis=-1)
        tv = jnp.mean(jnp.abs(jnp.diff(images, axis=1))) + jnp.mean(
            jnp.abs(jnp.diff(images, axis=2))
        )
        return tv - sat.mean()

"""CLIP-guided text-to-3D loss.

TPU-native equivalent of the reference's ``nerf/clip_utils.py``
(`CLIPLoss`): renders from random poses (``rand_pose`` mode,
provider.py:277-296) are scored by negative cosine similarity between
CLIP image embeddings and a text embedding (clip_utils.py:20-63).

The pretrained CLIP ViT-B/16 weights cannot be downloaded in this
offline image; pass ``model_path`` pointing at a local HuggingFace
checkout to enable (transformers is available). Without weights the
class raises a clear error at construction, and ``GradientImageLoss``
provides a dependency-free stand-in with the same interface so the
random-pose rendering path stays testable.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np


class CLIPLoss:
    def __init__(self, text: str, model_path: Optional[str] = None):
        if model_path is None:
            raise RuntimeError(
                "CLIP guidance needs pretrained weights; pass model_path= to a "
                "local 'openai/clip-vit-base-patch16' checkout (no network "
                "access in this image)."
            )
        from transformers import CLIPModel, CLIPProcessor

        self.model = CLIPModel.from_pretrained(model_path)
        self.processor = CLIPProcessor.from_pretrained(model_path)
        import torch

        with torch.no_grad():
            tokens = self.processor(text=[text], return_tensors="pt", padding=True)
            feat = self.model.get_text_features(**tokens)
            self.text_features = np.asarray(feat / feat.norm(dim=-1, keepdim=True))

    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """images: [B, H, W, 3] in [0, 1] → scalar loss (torch CPU
        evaluation; gradients through CLIP are not supported on this
        offline build — use for scoring/eval)."""
        import torch

        arr = np.asarray(images)
        with torch.no_grad():
            inputs = self.processor(images=list(arr), return_tensors="pt")
            feat = self.model.get_image_features(**inputs)
            feat = feat / feat.norm(dim=-1, keepdim=True)
        sim = feat.numpy() @ self.text_features.T
        return jnp.float32(-(sim.mean()))


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

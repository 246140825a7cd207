"""LPIPS perceptual distance in JAX (AlexNet backbone).

Functional equivalent of the reference's ``lpips.LPIPS(net='alex')``
meter (nerf/utils.py:280-314): AlexNet conv features at the five ReLU
taps, per-channel unit-normalization, learned 1x1 linear heads, spatial
mean, summed over layers (Zhang et al. 2018).

TPU-first notes: pure flax convs (XLA maps them onto the MXU), NHWC
layout, bf16-safe. Pretrained weights cannot be downloaded in this
image (zero egress) — ``load_torch_weights`` converts a locally
provided checkpoint (torchvision AlexNet state dict + LPIPS linear
heads, or the combined ``lpips`` package checkpoint); ``random_params``
initializes the same architecture for tests.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

# AlexNet feature stack (torchvision order). Each tap is the ReLU
# output; pools sit between taps 1-2 and 2-3.
_ALEX = (
    # (out_ch, kernel, stride, padding, maxpool_before)
    (64, 11, 4, 2, False),
    (192, 5, 1, 2, True),
    (384, 3, 1, 1, True),
    (256, 3, 1, 1, False),
    (256, 3, 1, 1, False),
)
_CHANNELS = tuple(c for c, *_ in _ALEX)

# LPIPS input scaling (x in [-1, 1]): (x - shift) / scale
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def random_params(rng: jax.Array, in_ch: int = 3) -> Dict[str, np.ndarray]:
    """Architecture-correct random weights (tests / smoke runs)."""
    params = {}
    keys = jax.random.split(rng, 2 * len(_ALEX))
    c_in = in_ch
    for i, (c_out, k, _, _, _) in enumerate(_ALEX):
        w = jax.random.normal(keys[2 * i], (k, k, c_in, c_out)) * (
            1.0 / np.sqrt(k * k * c_in)
        )
        params[f"conv{i}_w"] = np.asarray(w, np.float32)
        params[f"conv{i}_b"] = np.zeros((c_out,), np.float32)
        lin = jax.random.uniform(keys[2 * i + 1], (c_out,))
        params[f"lin{i}_w"] = np.asarray(lin, np.float32)
        c_in = c_out
    return params


def load_torch_weights(path: str) -> Dict[str, np.ndarray]:
    """Convert a locally provided torch checkpoint to LPIPS params.

    Accepts either the combined ``lpips`` package state dict (keys
    ``net.slice{1-5}.*`` + ``lin{0-4}.model.1.weight``) or a dict with
    ``alexnet`` (torchvision ``features.*``) and ``lins`` entries.
    torch is used only for deserialization (CPU, host-side).
    """
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: np.asarray(v) for k, v in sd.items() if hasattr(v, "numpy") or isinstance(v, np.ndarray)}

    def grab(*names):
        for n in names:
            if n in sd:
                return sd[n]
        raise KeyError(f"none of {names} in checkpoint ({list(sd)[:8]}...)")

    # torchvision features indices of the conv layers
    tv_idx = (0, 3, 6, 8, 10)
    # lpips-package slice layout: slice1=[0,1], slice2=[2..4], ...
    slice_names = (
        "net.slice1.0", "net.slice2.3", "net.slice3.6", "net.slice4.8", "net.slice5.10",
    )
    params = {}
    for i in range(len(_ALEX)):
        w = grab(f"features.{tv_idx[i]}.weight", f"alexnet.features.{tv_idx[i]}.weight",
                 f"{slice_names[i]}.weight")
        b = grab(f"features.{tv_idx[i]}.bias", f"alexnet.features.{tv_idx[i]}.bias",
                 f"{slice_names[i]}.bias")
        # torch OIHW -> flax HWIO
        params[f"conv{i}_w"] = np.transpose(w, (2, 3, 1, 0)).astype(np.float32)
        params[f"conv{i}_b"] = b.astype(np.float32)
        lw = grab(f"lin{i}.model.1.weight", f"lins.{i}.weight")
        params[f"lin{i}_w"] = lw.reshape(-1).astype(np.float32)
    return params


def _features(params, x: jnp.ndarray):
    """x: [B, H, W, 3] in [-1, 1] -> list of 5 tap activations."""
    h = (x - jnp.asarray(_SHIFT)) / jnp.asarray(_SCALE)
    taps = []
    for i, (_, k, stride, pad, pool) in enumerate(_ALEX):
        if pool:
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
            )
        h = jax.lax.conv_general_dilated(
            h, jnp.asarray(params[f"conv{i}_w"]),
            window_strides=(stride, stride),
            padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            # metric fidelity: TPU convs default to bf16 operands
            precision=jax.lax.Precision.HIGHEST,
        ) + jnp.asarray(params[f"conv{i}_b"])
        h = jax.nn.relu(h)
        taps.append(h)
    return taps


def lpips(params, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Perceptual distance between image batches [B, H, W, 3] in [0, 1].

    Differentiable and jittable — usable both as a meter and as a
    training loss (the reference backprops through LPIPS in its
    guidance mode).
    """
    x = 2.0 * x - 1.0
    y = 2.0 * y - 1.0
    fx = _features(params, x)
    fy = _features(params, y)
    total = jnp.zeros(x.shape[0], jnp.float32)
    for i, (a, b) in enumerate(zip(fx, fy)):
        a = a / jnp.sqrt(jnp.sum(a * a, axis=-1, keepdims=True) + 1e-10)
        b = b / jnp.sqrt(jnp.sum(b * b, axis=-1, keepdims=True) + 1e-10)
        d = (a - b) ** 2  # [B, h, w, C]
        w = jnp.asarray(params[f"lin{i}_w"])  # [C] 1x1 conv weights
        total = total + jnp.mean(jnp.sum(d * w, axis=-1), axis=(1, 2))
    return total

"""Color-space conversions (reference nerf/utils.py:44-51)."""

from __future__ import annotations

import jax.numpy as jnp


def linear_to_srgb(x: jnp.ndarray) -> jnp.ndarray:
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.where(x < 0.0031308, 12.92 * x, 1.055 * x ** (1 / 2.4) - 0.055)


def srgb_to_linear(x: jnp.ndarray) -> jnp.ndarray:
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.where(x < 0.04045, x / 12.92, ((x + 0.055) / 1.055) ** 2.4)


# numpy variants for host-side staging (dataset load, frame export) —
# eager jnp dispatch through the TPU tunnel costs seconds per op
def linear_to_srgb_np(x: "np.ndarray") -> "np.ndarray":
    import numpy as np

    x = np.clip(x, 0.0, 1.0)
    return np.where(x < 0.0031308, 12.92 * x, 1.055 * x ** (1 / 2.4) - 0.055)


def srgb_to_linear_np(x: "np.ndarray") -> "np.ndarray":
    import numpy as np

    x = np.clip(x, 0.0, 1.0)
    return np.where(x < 0.04045, x / 12.92, ((x + 0.055) / 1.055) ** 2.4)

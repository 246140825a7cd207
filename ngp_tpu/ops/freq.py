"""NeRF frequency (positional) encoding.

TPU-native equivalent of the reference's ``freqencoder/src/freqencoder.cu``
and the pure-torch fallback in ``encoding.py:5-43``: the output is
``[x, sin(2^0 x), cos(2^0 x), sin(2^1 x), cos(2^1 x), ...]`` concatenated
over the last axis, output dim = D * (1 + 2 * degree). Pure jnp — this
is trivially vectorizable VPU work and fuses into downstream matmuls;
autodiff replaces the reference's saved-output analytic backward.
"""

from __future__ import annotations

import jax.numpy as jnp


def freq_encode_dim(input_dim: int, degree: int) -> int:
    return input_dim * (1 + 2 * degree)


def freq_encode(x: jnp.ndarray, degree: int = 4) -> jnp.ndarray:
    """Positional-encode [..., D] → [..., D * (1 + 2*degree)]."""
    outs = [x]
    for i in range(degree):
        xi = x * (2.0**i)
        outs.append(jnp.sin(xi))
        outs.append(jnp.cos(xi))
    return jnp.concatenate(outs, axis=-1)

"""Truncated exponential activation.

TPU-native equivalent of the reference's ``activation.py:5-18``
(`trunc_exp`): forward is a plain exp evaluated in float32; the backward
clamps the *input* to [-15, 15] before exponentiating so that gradients
never overflow, which stabilises density-MLP training in half precision.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_jvp
def trunc_exp(x: jax.Array) -> jax.Array:
    """exp(x) with a gradient computed from clamp(x, -15, 15)."""
    return jnp.exp(x.astype(jnp.float32)).astype(x.dtype)


@trunc_exp.defjvp
def _trunc_exp_jvp(primals, tangents):
    (x,) = primals
    (dx,) = tangents
    y = trunc_exp(x)
    safe = jnp.exp(jnp.clip(x.astype(jnp.float32), -15.0, 15.0))
    return y, (safe * dx.astype(jnp.float32)).astype(x.dtype)

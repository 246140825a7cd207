"""Shared tiny-MLP backbone.

Replaces both the reference's per-network torch MLP stacks
(``nerf/network.py:33-58``) and its fully-fused CUDA FFMLP extension
(``ffmlp/``): on TPU a chain of small bf16 matmuls on a large batch is
already MXU-shaped, and XLA fuses the interleaved ReLUs — the
shared-memory-resident fusion the FFMLP kernel hand-builds is what the
compiler does natively. Hidden dims default to 64 (pad to MXU-friendly
sizes via config where it matters).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class MLP(nn.Module):
    """num_layers Linear(bias configurable) with ReLU between, no output act."""

    dim_out: int
    dim_hidden: int = 64
    num_layers: int = 3
    use_bias: bool = False
    compute_dtype: Any = None  # e.g. jnp.bfloat16 for MXU
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        dtype = self.compute_dtype or x.dtype
        h = x.astype(dtype)
        for i in range(self.num_layers):
            out = self.dim_out if i == self.num_layers - 1 else self.dim_hidden
            h = nn.Dense(
                out,
                use_bias=self.use_bias,
                dtype=dtype,
                param_dtype=self.param_dtype,
                name=f"dense_{i}",
            )(h)
            if i != self.num_layers - 1:
                h = nn.relu(h)
        return h

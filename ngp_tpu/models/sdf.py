"""SDF regression network.

TPU-native equivalent of the reference's ``sdf/netowrk.py`` [sic]
(`SDFNetwork`): hashgrid encoder + N-layer MLP (optional skip
connections) → scalar signed distance, optionally clamped to
±clip_sdf.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ngp_tpu.models.encoders import get_encoder


class SDFNetwork(nn.Module):
    encoding: str = "hashgrid"
    num_layers: int = 3
    skips: Tuple[int, ...] = ()
    hidden_dim: int = 64
    clip_sdf: Optional[float] = None
    use_bf16: bool = False

    @nn.compact
    def __call__(self, x):
        """x: [..., 3] in [-1, 1] → sdf [..., 1]."""
        dtype = jnp.bfloat16 if self.use_bf16 else None
        encoder, _ = get_encoder(self.encoding, compute_dtype=dtype)
        # grid encoder expects [0, 1]
        feat = encoder((x + 1.0) / 2.0)
        h = feat
        for l in range(self.num_layers):
            if l in self.skips:
                h = jnp.concatenate([h, feat], axis=-1)
            out_dim = 1 if l == self.num_layers - 1 else self.hidden_dim
            h = nn.Dense(
                out_dim,
                use_bias=False,
                dtype=dtype,
                name=f"dense_{l}",
            )(h)
            if l != self.num_layers - 1:
                h = nn.relu(h)
        h = h.astype(jnp.float32)
        if self.clip_sdf is not None:
            h = jnp.clip(h, -self.clip_sdf, self.clip_sdf)
        return h

"""Fused tiny-MLP Pallas kernel — the FFMLP analog.

TPU-native counterpart of the reference's ``ffmlp`` CUDA extension
(tiny-cuda-nn style: whole MLP in one kernel, activations resident in
shared memory, wmma tiles — ffmlp/src/ffmlp.cu:331-408). On TPU the
same idea maps to: all layer weights pinned in VMEM, the input streamed
in batch tiles, every layer's matmul hitting the MXU back-to-back with
ReLUs fused in-register — one kernel launch for the whole chain, no HBM
round-trips for activations.

Honest framing (measured on v5e, 512k x [32-64-64-16] bf16): this
kernel runs at 3.26 ms vs 2.17 ms for the plain XLA chain — XLA wins,
exactly the reference's own position on --ff (readme.md:225 "not
clearly better"). It exists for (a) API/feature parity with the ffmlp
extension, (b) a place to hand-tune once round-2 profiling says the
MLP matters.

Constraints (mirroring ffmlp.py:112-121 in spirit, adapted to MXU
tiling): hidden dim a multiple of 128 is ideal; input/output dims are
zero-padded to 128 lanes internally; batch padded to the tile size.
"""

from __future__ import annotations


from typing import Sequence

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pad_to(x: jnp.ndarray, dim: int, axis: int) -> jnp.ndarray:
    pad = dim - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def fused_mlp(
    x: jnp.ndarray,
    weights: Sequence[jnp.ndarray],
    tile: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """y = W_n · relu(W_{n-1} · ... relu(W_0 · x)).

    Args:
      x: [B, D_in] activations (any float dtype; compute is bf16 on the
        MXU with f32 accumulation).
      weights: list of [D_i, D_{i+1}] matrices (no biases, like FFMLP —
        ffmlp.py:141-144).
      tile: batch rows per kernel invocation.
      interpret: run in Pallas interpreter mode (CPU debugging).

    Returns [B, D_out] in float32.
    """
    B, d_in = x.shape
    dims = [d_in] + [w.shape[1] for w in weights]
    for i, w in enumerate(weights):
        if w.shape[0] != dims[i]:
            raise ValueError(f"weight {i} shape {w.shape} != expected in-dim {dims[i]}")
    d_out = dims[-1]

    # pad every dim to the 128-lane boundary; zero-padding is exact for
    # matmul+relu chains
    pdims = [max(128, ((d + 127) // 128) * 128) for d in dims]
    wp = [
        _pad_to(_pad_to(w.astype(jnp.bfloat16), pdims[i + 1], 1), pdims[i], 0)
        for i, w in enumerate(weights)
    ]
    n_layers = len(wp)

    Bp = ((B + tile - 1) // tile) * tile
    xp = _pad_to(x.astype(jnp.bfloat16), pdims[0], 1)
    xp = _pad_to(xp, Bp, 0)

    def kernel(x_ref, *refs):
        w_refs = refs[:n_layers]
        out_ref = refs[n_layers]
        h = x_ref[:]
        for i in range(n_layers):
            h = jnp.dot(h, w_refs[i][:], preferred_element_type=jnp.float32)
            if i != n_layers - 1:
                h = jnp.maximum(h, 0.0).astype(jnp.bfloat16)
        out_ref[:] = h

    out = pl.pallas_call(
        kernel,
        grid=(Bp // tile,),
        in_specs=[
            pl.BlockSpec((tile, pdims[0]), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ]
        + [
            pl.BlockSpec(
                (pdims[j], pdims[j + 1]), lambda i: (0, 0), memory_space=pltpu.VMEM
            )
            for j in range(n_layers)
        ],
        out_specs=pl.BlockSpec(
            (tile, pdims[-1]), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Bp, pdims[-1]), jnp.float32),
        interpret=interpret,
    )(xp, *wp)
    return out[:B, :d_out]

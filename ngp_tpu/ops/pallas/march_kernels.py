"""Pallas TPU kernel for the turbo march's coarse occupancy lookup.

The march tests every lattice probe against a byte-packed 4^3-pooled
occupancy grid (models/occupancy.py `_coarse_lookup`; the reference
instead gathers one grid byte per probe inside its CUDA DDA,
raymarching/src/raymarching.cu:372-380). The XLA formulation — one-hot
[P, R] @ payload [R, 128] then a second one-hot lane reduce —
materialises a [P, 128] f32 intermediate in HBM (~2 GB write+read for
a 4.2 M-probe training march).

This kernel keeps everything in VMEM and lane-dense. Probes arrive as
[bs, 128] int32 tiles (full lane utilisation — a [bm, 1] layout pads
to 128 lanes and re-creates the HBM problem as wasted DMA; measured
10x slower). The payload is tiny ([R, 128], R = 32*cascades) and VMEM
resident; the byte fetch is an unrolled loop over its R rows — each
iteration one lane-local take_along_axis (Mosaic dynamic-gather, the
gather shape TPUs do natively) plus a row-match select — so the whole
lookup is VPU work on dense tiles with 4 B in + 4 B out per probe of
HBM traffic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _kernel(R: int, fc_ref, pay_ref, out_ref):
    fc = fc_ref[:]  # [bs, 128] i32 flat coarse-cell ids
    row = fc >> 10  # payload row: 128 bytes * 8 cells per row
    lane = (fc >> 3) & 127  # byte lane within the row
    bit = fc & 7  # bit within the byte
    pay = pay_ref[:]  # [R, 128] f32 byte values
    byte = jnp.zeros(fc.shape, jnp.float32)
    for r in range(R):
        # lane-local dynamic gather of payload row r at each element's
        # byte lane, kept where the element's row matches
        vals_r = jnp.take_along_axis(
            jnp.broadcast_to(pay[r : r + 1, :], fc.shape), lane, axis=1
        )
        byte = jnp.where(row == r, vals_r, byte)
    out_ref[:] = (byte.astype(jnp.int32) >> bit) & 1


@functools.partial(jax.jit, static_argnames=("block",))
def coarse_lookup_bits(
    coarse_payload: jnp.ndarray, flatcell: jnp.ndarray, block: int = 512
) -> jnp.ndarray:
    """Occupancy bit for flat coarse-cell ids.

    coarse_payload : [R, 128] f32 byte values (pack_occupancy_payloads)
    flatcell       : [...] int32 in [0, R*128*8)
    block          : sublane rows per grid step (block*128 probes)
    returns        : [...] bool
    """
    R = coarse_payload.shape[0]
    shape = flatcell.shape
    fc = flatcell.reshape(-1)
    P = fc.shape[0]
    lanes = 128
    pad = (-P) % (block * lanes)
    if pad:
        fc = jnp.concatenate([fc, jnp.zeros((pad,), fc.dtype)])
    fc = fc.reshape(-1, lanes)
    out = pl.pallas_call(
        functools.partial(_kernel, R),
        out_shape=jax.ShapeDtypeStruct(fc.shape, jnp.int32),
        grid=(fc.shape[0] // block,),
        in_specs=[
            pl.BlockSpec(
                (block, lanes), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                coarse_payload.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (block, lanes), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=_interpret(),
    )(fc, coarse_payload)
    return (out.reshape(-1)[:P] > 0).reshape(shape)

"""3-D Morton (Z-order) codes and occupancy-grid bit packing.

TPU-native equivalents of the reference CUDA kernels
``raymarching/src/raymarching.cu:56-81, 214-300`` (`morton3D`,
`morton3D_invert`, `packbits`). On TPU these are pure integer
vector ops — the classic magic-number bit interleave runs on the VPU
with no kernel needed.

Note on usage: the reference stores its density grid in Morton order so
the CUDA DDA marcher gets cache-coherent neighbouring reads. The TPU
build stores the density grid in plain row-major (level, x, y, z) order
— XLA gathers don't benefit from Morton locality — but these utilities
are kept (a) for checkpoint/API parity, (b) for the partial
density-grid update, which resamples occupied cell indices.
"""

from __future__ import annotations

import jax.numpy as jnp


def _expand_bits(v: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of each uint32 out to every 3rd bit."""
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def _compact_bits(v: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`_expand_bits` (gather every 3rd bit)."""
    v = v & jnp.uint32(0x49249249)
    v = (v | (v >> 2)) & jnp.uint32(0xC30C30C3)
    v = (v | (v >> 4)) & jnp.uint32(0x0F00F00F)
    v = (v | (v >> 8)) & jnp.uint32(0xFF0000FF)
    v = (v | (v >> 16)) & jnp.uint32(0x0000FFFF)
    return v


def morton3d(coords: jnp.ndarray) -> jnp.ndarray:
    """Encode integer coords [..., 3] (each in [0, 1024)) to Z-order codes.

    Mirrors ``raymarching.cu:214-233`` (`morton3D`): code = expand(x)
    | expand(y) << 1 | expand(z) << 2.
    """
    c = coords.astype(jnp.uint32)
    code = (
        _expand_bits(c[..., 0])
        | (_expand_bits(c[..., 1]) << 1)
        | (_expand_bits(c[..., 2]) << 2)
    )
    return code.astype(jnp.int32)


def morton3d_invert(codes: jnp.ndarray) -> jnp.ndarray:
    """Decode Z-order codes [...] back to integer coords [..., 3]."""
    v = codes.astype(jnp.uint32)
    x = _compact_bits(v)
    y = _compact_bits(v >> 1)
    z = _compact_bits(v >> 2)
    return jnp.stack([x, y, z], axis=-1).astype(jnp.int32)


def packbits(grid: jnp.ndarray, thresh) -> jnp.ndarray:
    """Threshold a flattened density grid into a uint8 bitfield.

    Mirrors ``raymarching.cu:268-300`` (`packbits`): bit ``i`` of output
    byte ``n`` is set iff ``grid[8*n + i] > thresh`` (little-endian bit
    order within each byte).
    """
    flat = grid.reshape(-1, 8)
    bits = (flat > thresh).astype(jnp.uint8)
    weights = (jnp.uint8(1) << jnp.arange(8, dtype=jnp.uint8)).astype(jnp.uint8)
    return (bits * weights[None, :]).sum(axis=-1).astype(jnp.uint8)


def unpackbits(bitfield: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`packbits` → bool array of 8x the length."""
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (bitfield[..., None] >> shifts) & jnp.uint8(1)
    return bits.reshape(*bitfield.shape[:-1], -1).astype(jnp.bool_)

"""Brick-halo multiresolution grid encoding — the TPU-native fast path.

Motivation (measured on TPU v5e, see README): XLA gathers cost ~5 ns
per ROW regardless of row width, and scatter-adds ~40 ns per row; the
classic instant-ngp layout needs 8 corner gathers per (point, level),
so its cost is dominated by row COUNT. This encoder restructures the
table so one row holds a 2-cell-strided BRICK with a full 3x3x3 HALO of
cell values (27*C floats). Any trilinear stencil whose base cell lies
inside a brick is covered by that brick's halo, so encoding needs
exactly ONE gather per (point, level) — an 8x reduction in both gather
and scatter-add rows — and the 8 stencil corners are selected from the
27 in-register halo entries with static masked arithmetic (VPU).

Trade-off: halos of neighbouring bricks overlap, so a grid cell owns up
to 8 independent copies that receive gradients separately and may
drift apart, introducing small seams at brick boundaries — an
approximation in the same spirit as instant-ngp's unhandled hash
collisions (the MLP learns to absorb both). Parity notes: geometry
(level scales, [0,1] domain, OOB zeroing) matches
``ngp_tpu.ops.hashgrid``; the reference CUDA implementation has no
analog of this layout (it exists because GPUs have fast random 32-byte
loads and TPUs do not).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_PRIMES = (1, 2654435761, 805459861)


@dataclasses.dataclass(frozen=True)
class BrickGridConfig:
    input_dim: int = 3  # bricks are 3-D only (the hot NeRF case)
    num_levels: int = 8
    level_dim: int = 4
    per_level_scale: float = 2.0
    base_resolution: int = 16
    log2_hashmap_size: int = 15  # bricks per level cap
    desired_resolution: Optional[int] = None

    def __post_init__(self):
        if self.input_dim != 3:
            raise ValueError("BrickGrid supports input_dim=3")
        if self.desired_resolution is not None and self.num_levels > 1:
            s = math.exp2(
                math.log2(self.desired_resolution / self.base_resolution)
                / (self.num_levels - 1)
            )
            object.__setattr__(self, "per_level_scale", s)

    def level_scale(self, level: int) -> float:
        return math.exp2(level * math.log2(self.per_level_scale)) * self.base_resolution - 1.0

    def level_resolution(self, level: int) -> int:
        return int(math.ceil(self.level_scale(level))) + 1

    def level_bricks(self, level: int) -> Tuple[int, bool]:
        """(#brick rows, hashed?) for a level. Bricks tile the cell grid
        with stride 2; dense until the brick count overflows the cap."""
        res = self.level_resolution(level)
        side = res // 2 + 1
        dense = side**3
        cap = 2**self.log2_hashmap_size
        if dense <= cap:
            return dense, False
        return cap, True

    @property
    def offsets(self) -> Tuple[int, ...]:
        offs = [0]
        for l in range(self.num_levels):
            n, _ = self.level_bricks(l)
            offs.append(offs[-1] + n)
        return tuple(offs)

    @property
    def num_rows(self) -> int:
        return self.offsets[-1]

    @property
    def row_width(self) -> int:
        return 27 * self.level_dim

    @property
    def output_dim(self) -> int:
        return self.num_levels * self.level_dim

    def init(self, key: jax.Array, dtype=jnp.float32) -> jax.Array:
        return jax.random.uniform(
            key, (self.num_rows, self.row_width), dtype=dtype,
            minval=-1e-4, maxval=1e-4,
        )


def _brick_index(cfg: BrickGridConfig, level: int, bcoord: jnp.ndarray) -> jnp.ndarray:
    """Brick coords [..., 3] → row index within the level."""
    n, hashed = cfg.level_bricks(level)
    bc = bcoord.astype(jnp.uint32)
    if not hashed:
        res = cfg.level_resolution(level)
        side = res // 2 + 1
        idx = (bc[..., 0] * side + bc[..., 1]) * side + bc[..., 2]
    else:
        idx = (
            bc[..., 0] * jnp.uint32(_PRIMES[0])
            ^ bc[..., 1] * jnp.uint32(_PRIMES[1])
            ^ bc[..., 2] * jnp.uint32(_PRIMES[2])
        )
    return (idx % jnp.uint32(n)).astype(jnp.int32)


def dense_field_to_brick_table(
    field: np.ndarray, cfg: BrickGridConfig, level: int
) -> np.ndarray:
    """Build one level's brick rows from a dense cell field
    [R, R, R, C] (R = level resolution (+1 for the outer corners)).
    Used by tests (consistent halo copies → exact trilinear parity)
    and for importing dense grids."""
    n, hashed = cfg.level_bricks(level)
    if hashed:
        raise ValueError("only dense levels can be built from a field")
    res = cfg.level_resolution(level)
    side = res // 2 + 1
    C = cfg.level_dim
    padded = np.zeros((2 * side + 1, 2 * side + 1, 2 * side + 1, C), field.dtype)
    padded[: field.shape[0], : field.shape[1], : field.shape[2]] = field
    rows = np.zeros((n, 27 * C), field.dtype)
    for bx in range(side):
        for by in range(side):
            for bz in range(side):
                halo = padded[2 * bx : 2 * bx + 3, 2 * by : 2 * by + 3, 2 * bz : 2 * bz + 3]
                rows[(bx * side + by) * side + bz] = halo.reshape(-1)
    return rows


def brick_encode(
    x: jnp.ndarray,
    table: jnp.ndarray,
    cfg: BrickGridConfig,
    compute_dtype=None,
) -> jnp.ndarray:
    """Encode x in [0, 1]^3 → [..., L*C]; one table gather per level."""
    batch_shape = x.shape[:-1]
    x = x.reshape(-1, 3)
    xf = x.astype(jnp.promote_types(x.dtype, jnp.float32))
    tab = table if compute_dtype is None else table.astype(compute_dtype)
    C = cfg.level_dim
    oob = jnp.any((xf < 0.0) | (xf > 1.0), axis=-1)

    # compute per-level indices first, then gather ALL levels in one
    # take: autodiff then emits a single scatter-add (one grad-buffer
    # init + one scatter op instead of L of each)
    idx_levels, f_levels, lo_levels = [], [], []
    for level in range(cfg.num_levels):
        scale = cfg.level_scale(level)
        pos = xf * scale + 0.5
        x0 = jnp.floor(pos).astype(jnp.int32)
        f_levels.append((pos - x0).astype(tab.dtype))
        lo_levels.append(x0 & 1)
        idx_levels.append(_brick_index(cfg, level, x0 >> 1) + cfg.offsets[level])
    all_idx = jnp.stack(idx_levels, axis=1)  # [N, L]
    all_rows = jnp.take(tab, all_idx.reshape(-1), axis=0)  # [N*L, 27C]
    all_rows = all_rows.reshape(-1, cfg.num_levels, 27 * C)

    outs = []
    for level in range(cfg.num_levels):
        f = f_levels[level]
        lo = lo_levels[level]
        halo = all_rows[:, level].reshape(-1, 3, 3, 3, C)

        # select the 2x2x2 stencil at offset lo from the 3x3x3 halo:
        # static 2-way masked blend per axis (VPU, no gather)
        m0 = (lo[:, 0] == 1)[:, None, None, None, None]
        m1 = (lo[:, 1] == 1)[:, None, None, None, None]
        m2 = (lo[:, 2] == 1)[:, None, None, None, None]
        sx = jnp.where(m0, halo[:, 1:3], halo[:, 0:2])  # [N, 2, 3, 3, C]
        sy = jnp.where(m1, sx[:, :, 1:3], sx[:, :, 0:2])  # [N, 2, 2, 3, C]
        sz = jnp.where(m2, sy[:, :, :, 1:3], sy[:, :, :, 0:2])  # [N,2,2,2,C]

        # trilinear weights
        wx = jnp.stack([1.0 - f[:, 0], f[:, 0]], axis=-1)  # [N, 2]
        wy = jnp.stack([1.0 - f[:, 1], f[:, 1]], axis=-1)
        wz = jnp.stack([1.0 - f[:, 2], f[:, 2]], axis=-1)
        w = wx[:, :, None, None] * wy[:, None, :, None] * wz[:, None, None, :]
        feat = jnp.sum(sz * w[..., None].astype(sz.dtype), axis=(1, 2, 3))  # [N, C]
        outs.append(feat)

    out = jnp.concatenate(outs, axis=-1)
    out = jnp.where(oob[:, None], jnp.zeros_like(out), out)
    return out.reshape(*batch_shape, cfg.output_dim)

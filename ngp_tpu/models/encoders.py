"""Encoder factory and flax wrappers.

TPU-native equivalent of the reference's ``encoding.py:45-77``
(`get_encoder`): maps an encoding name to a flax module + output dim.
Supported: None (identity), 'frequency', 'sphere_harmonics',
'hashgrid', 'tiledgrid' — the same surface as the reference.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ngp_tpu.ops.brickgrid import BrickGridConfig, brick_encode
from ngp_tpu.ops.cpgrid import CPGridConfig, cpgrid_encode
from ngp_tpu.ops.freq import freq_encode, freq_encode_dim
from ngp_tpu.ops.hashgrid import GridConfig, grid_encode, grid_tv_loss
from ngp_tpu.ops.sh import sh_basis_dim, sh_encode


class Identity(nn.Module):
    input_dim: int = 3

    @nn.compact
    def __call__(self, x):
        return x

    @property
    def output_dim(self):
        return self.input_dim


class FreqEncoder(nn.Module):
    input_dim: int = 3
    degree: int = 12

    @nn.compact
    def __call__(self, x):
        return freq_encode(x, self.degree)

    @property
    def output_dim(self):
        return freq_encode_dim(self.input_dim, self.degree)


class SHEncoder(nn.Module):
    input_dim: int = 3
    degree: int = 4

    @nn.compact
    def __call__(self, dirs):
        return sh_encode(dirs, self.degree)

    @property
    def output_dim(self):
        return sh_basis_dim(self.degree)


class BrickGridEncoder(nn.Module):
    """Brick-halo multiresolution grid — the TPU fast path (one gather
    per point-level; see ngp_tpu.ops.brickgrid)."""

    cfg: BrickGridConfig
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        table = self.param("embeddings", lambda key: self.cfg.init(key))
        return brick_encode(x, table, self.cfg, compute_dtype=self.compute_dtype)

    @property
    def output_dim(self):
        return self.cfg.output_dim


class CPGridEncoder(nn.Module):
    """Multiresolution CP factor banks — the TPU flagship encoder
    (MXU matmul evaluation, zero random memory access; see
    ngp_tpu.ops.cpgrid / ops.pallas.cp_kernels)."""

    cfg: CPGridConfig
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        factors = tuple(
            self.param(
                f"factors_{r}",
                lambda key, rr=r: jax.random.normal(
                    key, (3, rr, self.cfg.rank), jnp.float32
                ) * self.cfg.init_scale,
            )
            for r in self.cfg.resolutions
        )
        return cpgrid_encode(x, factors, self.cfg, compute_dtype=self.compute_dtype)

    @property
    def output_dim(self):
        return self.cfg.output_dim


class GridEncoder(nn.Module):
    """Multiresolution hash/tiled grid encoder with learned table."""

    cfg: GridConfig
    compute_dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.embeddings = self.param(
            "embeddings",
            lambda key: self.cfg.init(key),
        )

    def __call__(self, x):
        return grid_encode(
            x, self.embeddings, self.cfg, compute_dtype=self.compute_dtype
        )

    def tv_loss(self, levels=None):
        """Scalar TV regulariser over dense (non-hashed) levels — the
        autodiff equivalent of the reference's grad_total_variation
        (gridencoder.cu:506-645)."""
        return grid_tv_loss(self.embeddings, self.cfg, levels=levels)

    @property
    def output_dim(self):
        return self.cfg.output_dim


def get_encoder(
    encoding: Optional[str],
    input_dim: int = 3,
    multires: int = 6,
    degree: int = 4,
    num_levels: int = 16,
    level_dim: int = 2,
    base_resolution: int = 16,
    log2_hashmap_size: int = 19,
    desired_resolution: int = 2048,
    align_corners: bool = False,
    compute_dtype=None,
    cp_resolutions: Tuple[int, ...] = (256, 512, 1024, 2048),
    cp_rank: int = 64,
    cp_freq_degree: int = 5,
) -> Tuple[nn.Module, int]:
    """String → (encoder module, output_dim), reference encoding.py:45-77."""
    if encoding is None or encoding == "None":
        return Identity(input_dim=input_dim), input_dim
    if encoding == "frequency":
        enc = FreqEncoder(input_dim=input_dim, degree=multires)
        return enc, enc.output_dim
    if encoding == "sphere_harmonics":
        enc = SHEncoder(input_dim=input_dim, degree=degree)
        return enc, enc.output_dim
    if encoding == "cpgrid":
        cfg = CPGridConfig(
            resolutions=tuple(cp_resolutions),
            rank=cp_rank,
            freq_degree=cp_freq_degree,
        )
        enc = CPGridEncoder(cfg=cfg, compute_dtype=compute_dtype)
        return enc, cfg.output_dim
    if encoding == "brickgrid":
        cfg = BrickGridConfig(
            num_levels=num_levels,
            level_dim=level_dim,
            base_resolution=base_resolution,
            log2_hashmap_size=min(log2_hashmap_size, 16),
            desired_resolution=desired_resolution,
        )
        enc = BrickGridEncoder(cfg=cfg, compute_dtype=compute_dtype)
        return enc, cfg.output_dim
    if encoding in ("hashgrid", "tiledgrid"):
        cfg = GridConfig(
            input_dim=input_dim,
            num_levels=num_levels,
            level_dim=level_dim,
            base_resolution=base_resolution,
            log2_hashmap_size=log2_hashmap_size,
            desired_resolution=desired_resolution,
            gridtype="hash" if encoding == "hashgrid" else "tiled",
            align_corners=align_corners,
        )
        enc = GridEncoder(cfg=cfg, compute_dtype=compute_dtype)
        return enc, cfg.output_dim
    raise ValueError(f"unknown encoding: {encoding}")

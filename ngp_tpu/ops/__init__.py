"""L0/L1 compute ops: encoders, ray utilities, losses, activations."""

from ngp_tpu.ops.activation import trunc_exp
from ngp_tpu.ops.freq import freq_encode, freq_encode_dim
from ngp_tpu.ops.hashgrid import GridConfig, grid_encode, grid_tv_loss
from ngp_tpu.ops.losses import eff_distloss, huber_loss, mape_loss
from ngp_tpu.ops.morton import morton3d, morton3d_invert, packbits, unpackbits
from ngp_tpu.ops.rays import near_far_from_aabb, rays_from_pixels, sph_from_ray
from ngp_tpu.ops.sh import sh_basis_dim, sh_encode

__all__ = [
    "trunc_exp",
    "freq_encode",
    "freq_encode_dim",
    "GridConfig",
    "grid_encode",
    "grid_tv_loss",
    "eff_distloss",
    "huber_loss",
    "mape_loss",
    "morton3d",
    "morton3d_invert",
    "packbits",
    "unpackbits",
    "near_far_from_aabb",
    "rays_from_pixels",
    "sph_from_ray",
    "sh_basis_dim",
    "sh_encode",
]

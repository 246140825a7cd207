"""D-NeRF: dynamic scenes via canonical-space deformation.

TPU-native equivalent of the reference ``dnerf/`` family:

- **deform** variant (dnerf/network.py): freq(x, 10) ⊕ freq(t, 6) →
  5x128 MLP → Δx; canonical point x+Δx feeds the hashgrid sigma net,
  whose input is concat(hash(x+Δx), freq(t), freq(x)); SH-dir color
  net as static NeRF. forward returns (sigma, rgb, deform) and the
  trainer adds an L1 deform regulariser.
- **basis** variant (dnerf/network_basis.py): no deformation; sigma
  and color come from dot products of spatial feature heads with a
  shared learned temporal basis vector basis(t).
- time-sliced occupancy (dnerf/renderer.py:74-100): density grid gains
  a leading time axis [T=64, CAS, H^3]; the marcher indexes the slice
  nearest to the batch time; updates sweep all slices and freeze after
  100 iterations (dnerf/renderer.py:463-550) — see
  ``ngp_tpu.training.dnerf``.
"""

from __future__ import annotations



import flax.linen as nn
import jax.numpy as jnp

from ngp_tpu.config import NetworkConfig, RenderConfig
from ngp_tpu.models.encoders import get_encoder
from ngp_tpu.models.mlp import MLP
from ngp_tpu.ops.activation import trunc_exp
from ngp_tpu.ops.freq import freq_encode


class DNeRFNetwork(nn.Module):
    """Deformation-network variant (dnerf/network.py)."""

    cfg: NetworkConfig
    render: RenderConfig
    num_layers_deform: int = 5
    hidden_dim_deform: int = 128
    deform_multires: int = 10
    time_multires: int = 6

    def setup(self):
        c = self.cfg
        dtype = jnp.bfloat16 if c.use_bf16 else None
        self.deform_net = MLP(
            dim_out=3, dim_hidden=self.hidden_dim_deform,
            num_layers=self.num_layers_deform, compute_dtype=dtype,
            name="deform_net",
        )
        self.encoder, _ = get_encoder(
            c.encoding,
            num_levels=c.num_levels, level_dim=c.level_dim,
            base_resolution=c.base_resolution,
            log2_hashmap_size=c.log2_hashmap_size,
            desired_resolution=int(2048 * self.render.bound),
            compute_dtype=dtype,
        )
        self.sigma_net = MLP(
            dim_out=1 + c.geo_feat_dim, dim_hidden=c.hidden_dim,
            num_layers=c.num_layers, compute_dtype=dtype, name="sigma_net",
        )
        self.encoder_dir, _ = get_encoder(c.encoding_dir, degree=c.sh_degree)
        self.color_net = MLP(
            dim_out=3, dim_hidden=c.hidden_dim_color,
            num_layers=c.num_layers_color, compute_dtype=dtype, name="color_net",
        )

    def _scale_to_unit(self, x):
        b = self.render.bound
        return (x + b) / (2 * b)

    def deform(self, x, t):
        """x: [..., 3]; t: scalar in [0, 1] → Δx [..., 3]."""
        enc_x = freq_encode(x, self.deform_multires)
        enc_t = freq_encode(jnp.full(x.shape[:-1] + (1,), t), self.time_multires)
        h = jnp.concatenate([enc_x, enc_t], axis=-1)
        return self.deform_net(h).astype(jnp.float32), enc_x, enc_t

    def density(self, x, t):
        """→ (sigma [...], geo_feat [..., G], deform [..., 3])."""
        dx, enc_x, enc_t = self.deform(x, t)
        xd = x + dx
        h = self.encoder(self._scale_to_unit(xd))
        h = jnp.concatenate([h, enc_t.astype(h.dtype), enc_x.astype(h.dtype)], axis=-1)
        h = self.sigma_net(h)
        sigma = trunc_exp(h[..., 0].astype(jnp.float32))
        return sigma, h[..., 1:], dx

    def color(self, d, geo_feat):
        de = self.encoder_dir(d)
        h = jnp.concatenate([de.astype(geo_feat.dtype), geo_feat], axis=-1)
        return nn.sigmoid(self.color_net(h).astype(jnp.float32))

    def __call__(self, x, d, t):
        sigma, geo, dx = self.density(x, t)
        return sigma, self.color(d, geo), dx

    def full_init(self, x, d, t):
        return self(x, d, t)


class DNeRFHyperNetwork(nn.Module):
    """Hyper-space variant (dnerf/network_hyper.py): time maps through
    an ambient MLP to extra grid coordinates; the hash grid becomes
    (3 + ambient_dim)-dimensional, ambient = tanh(MLP(freq(t))) * bound
    (network_hyper.py:126-138)."""

    cfg: NetworkConfig
    render: RenderConfig
    num_layers_ambient: int = 5
    hidden_dim_ambient: int = 128
    ambient_dim: int = 1
    time_multires: int = 6

    def setup(self):
        c = self.cfg
        dtype = jnp.bfloat16 if c.use_bf16 else None
        self.ambient_net = MLP(
            dim_out=self.ambient_dim, dim_hidden=self.hidden_dim_ambient,
            num_layers=self.num_layers_ambient, compute_dtype=dtype,
            name="ambient_net",
        )
        self.encoder, _ = get_encoder(
            c.encoding,
            input_dim=3 + self.ambient_dim,
            num_levels=c.num_levels, level_dim=c.level_dim,
            base_resolution=c.base_resolution,
            log2_hashmap_size=c.log2_hashmap_size,
            desired_resolution=int(2048 * self.render.bound),
            compute_dtype=dtype,
        )
        self.sigma_net = MLP(
            dim_out=1 + c.geo_feat_dim, dim_hidden=c.hidden_dim,
            num_layers=c.num_layers, compute_dtype=dtype, name="sigma_net",
        )
        self.encoder_dir, _ = get_encoder(c.encoding_dir, degree=c.sh_degree)
        self.color_net = MLP(
            dim_out=3, dim_hidden=c.hidden_dim_color,
            num_layers=c.num_layers_color, compute_dtype=dtype, name="color_net",
        )

    def _scale_to_unit(self, x):
        b = self.render.bound
        return (x + b) / (2 * b)

    def ambient(self, t):
        enc_t = freq_encode(jnp.asarray([[t]], jnp.float32), self.time_multires)
        a = self.ambient_net(enc_t).astype(jnp.float32)
        return jnp.tanh(a)[0] * self.render.bound  # [ambient_dim]

    def density(self, x, t):
        amb = self.ambient(t)
        x4 = jnp.concatenate(
            [x, jnp.broadcast_to(amb, x.shape[:-1] + (self.ambient_dim,))], axis=-1
        )
        h = self.encoder(self._scale_to_unit(x4))
        h = self.sigma_net(h)
        sigma = trunc_exp(h[..., 0].astype(jnp.float32))
        return sigma, h[..., 1:], jnp.zeros_like(x)

    def color(self, d, geo_feat):
        de = self.encoder_dir(d)
        h = jnp.concatenate([de.astype(geo_feat.dtype), geo_feat], axis=-1)
        return nn.sigmoid(self.color_net(h).astype(jnp.float32))

    def __call__(self, x, d, t):
        sigma, geo, dx = self.density(x, t)
        return sigma, self.color(d, geo), dx

    def full_init(self, x, d, t):
        return self(x, d, t)


class DNeRFBasisNetwork(nn.Module):
    """Temporal-basis variant (dnerf/network_basis.py): spatial heads
    produce per-basis coefficients; scalar outputs are their dot
    product with a learned basis(t)."""

    cfg: NetworkConfig
    render: RenderConfig
    num_basis: int = 4
    time_multires: int = 6

    def setup(self):
        c = self.cfg
        dtype = jnp.bfloat16 if c.use_bf16 else None
        self.encoder, _ = get_encoder(
            c.encoding,
            num_levels=c.num_levels, level_dim=c.level_dim,
            base_resolution=c.base_resolution,
            log2_hashmap_size=c.log2_hashmap_size,
            desired_resolution=int(2048 * self.render.bound),
            compute_dtype=dtype,
        )
        self.basis_net = MLP(
            dim_out=self.num_basis, dim_hidden=128, num_layers=3,
            compute_dtype=dtype, name="basis_net",
        )
        self.sigma_net = MLP(
            dim_out=(1 + c.geo_feat_dim) * self.num_basis,
            dim_hidden=c.hidden_dim, num_layers=c.num_layers,
            compute_dtype=dtype, name="sigma_net",
        )
        self.encoder_dir, _ = get_encoder(c.encoding_dir, degree=c.sh_degree)
        self.color_net = MLP(
            dim_out=3 * self.num_basis, dim_hidden=c.hidden_dim_color,
            num_layers=c.num_layers_color, compute_dtype=dtype, name="color_net",
        )

    def _scale_to_unit(self, x):
        b = self.render.bound
        return (x + b) / (2 * b)

    def basis(self, t):
        enc_t = freq_encode(jnp.asarray([[t]], jnp.float32), self.time_multires)
        return self.basis_net(enc_t)[0].astype(jnp.float32)  # [K]

    def density(self, x, t):
        c = self.cfg
        b = self.basis(t)  # [K]
        h = self.encoder(self._scale_to_unit(x))
        h = self.sigma_net(h).astype(jnp.float32)
        h = h.reshape(*x.shape[:-1], 1 + c.geo_feat_dim, self.num_basis)
        out = jnp.einsum("...ck,k->...c", h, b)
        sigma = trunc_exp(out[..., 0])
        geo = jnp.concatenate([out[..., 1:], jnp.broadcast_to(b, x.shape[:-1] + (self.num_basis,))], axis=-1)
        return sigma, geo, jnp.zeros_like(x)

    def color(self, d, geo_feat):
        b = geo_feat[..., -self.num_basis:]
        geo = geo_feat[..., : -self.num_basis]
        de = self.encoder_dir(d)
        h = jnp.concatenate([de, geo], axis=-1)
        h = self.color_net(h).astype(jnp.float32)
        h = h.reshape(*d.shape[:-1], 3, self.num_basis)
        return nn.sigmoid(jnp.einsum("...ck,...k->...c", h, b))

    def __call__(self, x, d, t):
        sigma, geo, dx = self.density(x, t)
        return sigma, self.color(d, geo), dx

    def full_init(self, x, d, t):
        return self(x, d, t)

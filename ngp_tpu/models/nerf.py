"""Instant-ngp style NeRF network head.

TPU-native equivalent of the reference's ``nerf/network.py:10-207``
(`NeRFNetwork`): hashgrid → 2-layer sigma MLP (out 1+geo_feat), SH(dir)
⊕ geo_feat → 3-layer color MLP (sigmoid), optional background net
(2-D hashgrid over sphere coords ⊕ SH(dir) → 2-layer MLP).

Differences by design (TPU-first):
- flax.linen module with named methods, pure params, no renderer base
  class — rendering lives in :mod:`ngp_tpu.models.renderer` as
  functions over (apply_fn, params).
- all MLPs run in bf16 on the MXU when ``use_bf16`` (replaces fp16
  AMP); the hash table gathers in bf16 too, grads accumulate fp32.
- no masked-inference `color(mask=...)` variant: TPU batches are dense
  fixed shapes, masking happens in the compositor.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ngp_tpu.config import NetworkConfig, RenderConfig
from ngp_tpu.models.encoders import get_encoder
from ngp_tpu.models.mlp import MLP
from ngp_tpu.ops.activation import trunc_exp


class NeRFNetwork(nn.Module):
    cfg: NetworkConfig
    render: RenderConfig

    def setup(self):
        c = self.cfg
        dtype = jnp.bfloat16 if c.use_bf16 else None
        self.encoder, self.in_dim = get_encoder(
            c.encoding,
            num_levels=c.num_levels,
            level_dim=c.level_dim,
            base_resolution=c.base_resolution,
            log2_hashmap_size=c.log2_hashmap_size,
            desired_resolution=int(2048 * self.render.bound),
            compute_dtype=dtype,
            cp_resolutions=c.cp_resolutions,
            cp_rank=c.cp_rank,
            cp_freq_degree=c.cp_freq_degree,
        )
        self.sigma_net = MLP(
            dim_out=1 + c.geo_feat_dim,
            dim_hidden=c.hidden_dim,
            num_layers=c.num_layers,
            compute_dtype=dtype,
            name="sigma_net",
        )
        self.encoder_dir, self.in_dim_dir = get_encoder(
            c.encoding_dir, degree=c.sh_degree
        )
        self.color_net = MLP(
            dim_out=3,
            dim_hidden=c.hidden_dim_color,
            num_layers=c.num_layers_color,
            compute_dtype=dtype,
            name="color_net",
        )
        if self.render.bg_radius > 0:
            self.encoder_bg, self.in_dim_bg = get_encoder(
                c.encoding_bg,
                input_dim=2,
                num_levels=4,
                log2_hashmap_size=19,
                desired_resolution=2048,
                compute_dtype=dtype,
            )
            self.bg_net = MLP(
                dim_out=3,
                dim_hidden=c.hidden_dim_bg,
                num_layers=c.num_layers_bg,
                compute_dtype=dtype,
                name="bg_net",
            )

    def _scale_to_unit(self, x):
        """[-bound, bound] → [0, 1] for the grid encoder (grid.py:149)."""
        b = self.render.bound
        return (x + b) / (2 * b)

    def density(self, x):
        """x: [..., 3] in [-bound, bound] → (sigma [...], geo_feat [..., G])."""
        h = self.encoder(self._scale_to_unit(x))
        h = self.sigma_net(h)
        sigma = trunc_exp(h[..., 0].astype(jnp.float32))
        geo_feat = h[..., 1:]
        return sigma, geo_feat

    def color(self, d, geo_feat):
        """d: [..., 3] unit dirs; geo_feat from :meth:`density` → rgb [..., 3]."""
        de = self.encoder_dir(d)
        h = jnp.concatenate([de.astype(geo_feat.dtype), geo_feat], axis=-1)
        h = self.color_net(h)
        return nn.sigmoid(h.astype(jnp.float32))

    def __call__(self, x, d):
        """Full forward: (sigma [...], rgb [..., 3])."""
        sigma, geo_feat = self.density(x)
        rgb = self.color(d, geo_feat)
        return sigma, rgb

    def full_init(self, x, d):
        """Init-time method touching every submodule (flax only creates
        params for modules traced during ``init``): forward + background."""
        sigma, rgb = self(x, d)
        if self.render.bg_radius > 0:
            sph = jnp.zeros(x.shape[:-1] + (2,), dtype=x.dtype)
            rgb = rgb + 0.0 * self.background(sph, d)
        return sigma, rgb

    def tv_loss(self):
        """Scalar TV regulariser on the spatial grid encoder (0 for
        encodings without a dense table) — wires the reference's
        grad_total_variation (gridencoder.cu:506-645) as a loss term."""
        if hasattr(self.encoder, "tv_loss"):
            return self.encoder.tv_loss()
        return jnp.float32(0.0)

    def background(self, sph, d):
        """sph: [..., 2] in [-1, 1] (sphere coords); d: [..., 3] → rgb."""
        if self.render.bg_radius <= 0:
            raise ValueError("background() requires bg_radius > 0")
        h = self.encoder_bg((sph + 1.0) / 2.0)
        de = self.encoder_dir(d)
        h = jnp.concatenate([de.astype(h.dtype), h], axis=-1)
        h = self.bg_net(h)
        return nn.sigmoid(h.astype(jnp.float32))


def make_fused_density(model: NeRFNetwork, params) -> "callable | None":
    """Fused density fn for the flagship config, or None.

    When the model is the cpgrid encoder + 2-layer sigma MLP, returns a
    drop-in replacement for ``model.apply(params, x, method=density)``
    built directly on the raw param arrays and the one-pass Pallas head
    (ops/cpgrid.cpgrid_density): the [M, ~680] feature rows never round
    trip through HBM. Bypasses flax module dispatch, so the param tree
    must carry the expected names ('encoder'/'factors_<res>',
    'sigma_net'/'dense_{0,1}'/'kernel'); anything else returns None and
    callers keep the module path (CPU mesh runs, TP-sharded params,
    other encoders).
    """
    c = model.cfg
    if c.encoding != "cpgrid" or c.num_layers != 2:
        return None
    from ngp_tpu.ops.cpgrid import CPGridConfig, cpgrid_density

    try:
        p = params["params"]
        enc = p["encoder"]
        net = p["sigma_net"]
        factors = tuple(enc[f"factors_{r}"] for r in c.cp_resolutions)
        w1 = net["dense_0"]["kernel"]
        w2 = net["dense_1"]["kernel"]
    except (KeyError, TypeError):
        return None
    cfg = CPGridConfig(
        resolutions=tuple(c.cp_resolutions),
        rank=c.cp_rank,
        freq_degree=c.cp_freq_degree,
    )
    if w1.shape[0] != cfg.output_dim:
        return None
    dtype = jnp.bfloat16 if c.use_bf16 else None
    b = model.render.bound

    def density_fn(x):
        h = cpgrid_density(
            (x + b) / (2 * b), factors, w1, w2, cfg, compute_dtype=dtype
        )
        sigma = trunc_exp(h[..., 0])
        geo = h[..., 1:]
        if dtype is not None:
            geo = geo.astype(dtype)
        return sigma, geo

    return density_fn


def make_fused_sigma_rgb(model: NeRFNetwork, params) -> "callable | None":
    """Fused EVAL radiance fn for the flagship config, or None.

    Returns ``vals_fn(pts [M, 3], dirs [M, 3]) -> [M, 4] f32`` — the
    compositor's (sigma, rgb) rows from ONE Pallas pass over the whole
    network (ops/cpgrid.cpgrid_sigma_rgb): density, SH, color MLP and
    both activations run without a single intermediate HBM round trip.
    INFERENCE-ONLY (the kernel has no vjp — training keeps
    make_fused_density + the module color path, which save residuals).
    Same param-tree contract as make_fused_density plus
    'color_net'/'dense_{0..}'; anything unexpected returns None and
    callers keep the unfused pair."""
    c = model.cfg
    if (
        c.encoding != "cpgrid"
        or c.num_layers != 2
        or c.encoding_dir != "sphere_harmonics"
    ):
        return None
    from ngp_tpu.ops.cpgrid import CPGridConfig, cpgrid_sigma_rgb

    try:
        p = params["params"]
        enc = p["encoder"]
        net = p["sigma_net"]
        cnet = p["color_net"]
        factors = tuple(enc[f"factors_{r}"] for r in c.cp_resolutions)
        w1 = net["dense_0"]["kernel"]
        w2 = net["dense_1"]["kernel"]
        color_ws = tuple(
            cnet[f"dense_{i}"]["kernel"] for i in range(c.num_layers_color)
        )
    except (KeyError, TypeError):
        return None
    cfg = CPGridConfig(
        resolutions=tuple(c.cp_resolutions),
        rank=c.cp_rank,
        freq_degree=c.cp_freq_degree,
    )
    if w1.shape[0] != cfg.output_dim:
        return None
    if color_ws[0].shape[0] != c.sh_degree**2 + c.geo_feat_dim:
        return None
    dtype = jnp.bfloat16 if c.use_bf16 else None
    b = model.render.bound

    def vals_fn(x, d):
        return cpgrid_sigma_rgb(
            (x + b) / (2 * b), d, factors, w1, w2, color_ws, cfg,
            c.sh_degree, compute_dtype=dtype,
        )

    return vals_fn

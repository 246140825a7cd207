"""Renderer math tests: compositing against analytic transmittance,
PDF sampling sanity, NeRF network shapes."""

import numpy as np
import jax
import jax.numpy as jnp

from ngp_tpu.config import NetworkConfig, RenderConfig
from ngp_tpu.models.nerf import NeRFNetwork
from ngp_tpu.models.renderer import composite, render_rays, sample_pdf


def test_composite_analytic_homogeneous():
    """Constant sigma -> image = (1 - exp(-sigma*L)) * c, the analytic
    emission-absorption solution for a homogeneous medium."""
    N, T = 4, 256
    sigma_val = 2.0
    L = 1.5
    deltas = jnp.full((N, T), L / T)
    sigmas = jnp.full((N, T), sigma_val)
    rgbs = jnp.broadcast_to(jnp.asarray([0.2, 0.5, 0.9]), (N, T, 3))
    out = composite(sigmas, rgbs, deltas)
    expect_alpha = 1.0 - np.exp(-sigma_val * L)
    np.testing.assert_allclose(np.asarray(out["weights_sum"]), expect_alpha, rtol=1e-2)
    np.testing.assert_allclose(
        np.asarray(out["image"]),
        np.broadcast_to(expect_alpha * np.asarray([0.2, 0.5, 0.9]), (N, 3)),
        rtol=1e-2,
    )


def test_composite_opaque_surface():
    """A single huge-sigma sample acts like an opaque surface: the
    composited color equals that sample's color and later samples are
    fully occluded."""
    N, T = 1, 8
    sigmas = jnp.zeros((N, T)).at[0, 3].set(1e6)
    deltas = jnp.full((N, T), 0.1)
    rgbs = jnp.zeros((N, T, 3)).at[0, 3].set(jnp.asarray([1.0, 0.0, 0.0]))
    rgbs = rgbs.at[0, 5].set(jnp.asarray([0.0, 1.0, 0.0]))  # occluded
    out = composite(sigmas, rgbs, deltas)
    np.testing.assert_allclose(np.asarray(out["image"][0]), [1.0, 0.0, 0.0], atol=1e-5)
    np.testing.assert_allclose(float(out["weights_sum"][0]), 1.0, atol=1e-5)


def test_sample_pdf_concentrates():
    B, T = 2, 64
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, T), (B, T))
    w = np.zeros((B, T - 1), dtype=np.float32)
    w[:, 40:44] = 1.0  # all mass near z ~ 0.64
    z = np.asarray(sample_pdf(bins, jnp.asarray(w), 32, rng=None))
    assert z.shape == (B, 32)
    assert np.all(z >= 0) and np.all(z <= 1)
    assert np.mean((z > 0.55) & (z < 0.75)) > 0.9
    # stochastic mode too
    z2 = np.asarray(sample_pdf(bins, jnp.asarray(w), 32, rng=jax.random.PRNGKey(0)))
    assert np.mean((z2 > 0.55) & (z2 < 0.75)) > 0.9


def _toy_fns():
    """Analytic scene: ball of radius 0.5, sigma=8 inside, red-ish color."""

    def density_fn(x):
        r = jnp.linalg.norm(x, axis=-1)
        sigma = jnp.where(r < 0.5, 8.0, 0.0)
        return sigma, jnp.zeros(x.shape[:-1] + (1,))

    def color_fn(d, geo):
        return jnp.broadcast_to(jnp.asarray([0.8, 0.3, 0.1]), d.shape)

    return density_fn, color_fn


def test_render_rays_toy_scene_matches_quadrature():
    density_fn, color_fn = _toy_fns()
    cfg = RenderConfig(bound=1.0, min_near=0.05, num_steps=256, upsample_steps=0)
    # rays from z=-2 through the center and a miss ray
    rays_o = jnp.asarray([[0.0, 0.0, -2.0], [0.0, 0.9, -2.0]])
    rays_d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    out = render_rays(density_fn, color_fn, rays_o, rays_d, cfg, bg_color=jnp.float32(0.0))
    # center ray passes through 1.0 of medium: alpha = 1 - exp(-8)
    expect = 1.0 - np.exp(-8.0 * 1.0)
    np.testing.assert_allclose(float(out["weights_sum"][0]), expect, atol=5e-2)
    np.testing.assert_allclose(
        np.asarray(out["image"][0]), expect * np.asarray([0.8, 0.3, 0.1]), atol=5e-2
    )
    # ray at y=0.9 misses the ball entirely
    np.testing.assert_allclose(float(out["weights_sum"][1]), 0.0, atol=1e-5)


def test_render_rays_upsample_improves_thin_shell():
    """PDF upsampling should resolve a thin dense shell better than the
    same total uniform budget spread over the interval."""
    def density_fn(x):
        r = jnp.linalg.norm(x, axis=-1)
        sigma = jnp.where(jnp.abs(r - 0.5) < 0.01, 500.0, 0.0)
        return sigma, jnp.zeros(x.shape[:-1] + (1,))

    def color_fn(d, geo):
        return jnp.ones(d.shape)

    rays_o = jnp.asarray([[0.0, 0.0, -2.0]])
    rays_d = jnp.asarray([[0.0, 0.0, 1.0]])
    cfg_up = RenderConfig(bound=1.0, min_near=0.05, num_steps=64, upsample_steps=64)
    out_up = render_rays(density_fn, color_fn, rays_o, rays_d, cfg_up, bg_color=jnp.float32(0.0))
    # true answer: shell of thickness 0.02, sigma 500 -> alpha ~ 1 - exp(-10) ~ 1
    assert float(out_up["weights_sum"][0]) > 0.9


def test_nerf_network_shapes():
    net_cfg = NetworkConfig(num_levels=4, log2_hashmap_size=10, use_bf16=False)
    r_cfg = RenderConfig(bound=1.0)
    model = NeRFNetwork(cfg=net_cfg, render=r_cfg)
    x = jnp.zeros((32, 3))
    d = jnp.concatenate([jnp.ones((32, 1)), jnp.zeros((32, 2))], axis=-1)
    params = model.init(jax.random.PRNGKey(0), x, d)
    sigma, rgb = model.apply(params, x, d)
    assert sigma.shape == (32,) and rgb.shape == (32, 3)
    assert np.all(np.asarray(sigma) >= 0)
    assert np.all((np.asarray(rgb) >= 0) & (np.asarray(rgb) <= 1))
    s2, geo = model.apply(params, x, method=NeRFNetwork.density)
    assert geo.shape == (32, net_cfg.geo_feat_dim)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(sigma), rtol=1e-5)


def test_nerf_network_background():
    net_cfg = NetworkConfig(num_levels=4, log2_hashmap_size=10, use_bf16=False)
    r_cfg = RenderConfig(bound=1.0, bg_radius=32.0)
    model = NeRFNetwork(cfg=net_cfg, render=r_cfg)
    x = jnp.zeros((8, 3))
    d = jnp.concatenate([jnp.ones((8, 1)), jnp.zeros((8, 2))], axis=-1)
    params = model.init(jax.random.PRNGKey(0), x, d, method=NeRFNetwork.full_init)
    sph = jnp.zeros((8, 2))
    bg = model.apply(params, sph, d, method=NeRFNetwork.background)
    assert bg.shape == (8, 3)

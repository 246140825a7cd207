"""CP factor-bank Pallas kernels: parity vs the jnp reference and
gradient correctness (the backward is a dense matmul replacing the
reference's atomic scatter-add, gridencoder.cu:323-444)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ngp_tpu.ops.pallas.cp_kernels import cp_encode, cp_encode_reference

RES = (32, 64)
RANK = 16


def _setup(m=300, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    pos = jnp.asarray(rng.uniform(0, 1, size=(m, 3)).astype(np.float32))
    factors = tuple(
        jnp.asarray(rng.normal(0, 0.3, size=(3, r, RANK)).astype(np.float32), dtype)
        for r in RES
    )
    return pos, factors


def test_forward_parity():
    pos, factors = _setup()
    out_k = cp_encode(pos, factors, RES, 128)
    out_r = cp_encode_reference(pos, factors, RES)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r), atol=1e-5)


def test_forward_unpadded_tail():
    # M not a multiple of the block: padding must not leak
    pos, factors = _setup(m=200)
    out_k = cp_encode(pos, factors, RES, 128)
    out_r = cp_encode_reference(pos, factors, RES)
    assert out_k.shape == (200, len(RES) * RANK)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r), atol=1e-5)


def test_backward_parity():
    pos, factors = _setup()
    rng = np.random.default_rng(1)
    g = jnp.asarray(rng.normal(size=(300, len(RES) * RANK)).astype(np.float32))

    def loss_k(fs):
        return jnp.sum(cp_encode(pos, fs, RES, 128) * g)

    def loss_r(fs):
        return jnp.sum(cp_encode_reference(pos, fs, RES) * g)

    gk = jax.grad(loss_k)(factors)
    gr = jax.grad(loss_r)(factors)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3)


def test_backward_finite_difference():
    pos, factors = _setup(m=64)
    rng = np.random.default_rng(2)
    g = jnp.asarray(rng.normal(size=(64, len(RES) * RANK)).astype(np.float32))

    def loss(fs):
        return jnp.sum(cp_encode(pos, fs, RES, 64) * g)

    grads = jax.grad(loss)(factors)
    eps = 1e-3
    for trial in range(5):
        b = trial % len(RES)
        ax = rng.integers(0, 3)
        i = rng.integers(0, RES[b])
        r = rng.integers(0, RANK)
        fp = list(factors)
        fp[b] = factors[b].at[ax, i, r].add(eps)
        fm = list(factors)
        fm[b] = factors[b].at[ax, i, r].add(-eps)
        fd = (loss(tuple(fp)) - loss(tuple(fm))) / (2 * eps)
        an = grads[b][ax, i, r]
        np.testing.assert_allclose(float(an), float(fd), atol=2e-2, rtol=2e-2)


def test_oob_zeroes():
    """OOB samples get zero features AND zero factor gradients — the
    reference's out-of-[0,1] semantics (gridencoder.cu:110-135), now
    applied in-kernel (a post-kernel where would re-stream the whole
    output through HBM)."""
    pos, factors = _setup(m=8)
    pos = pos.at[0].set(jnp.array([-0.5, 0.5, 0.5]))
    pos = pos.at[1].set(jnp.array([0.5, 1.7, 0.5]))
    out = cp_encode(pos, factors, RES, 8)
    np.testing.assert_allclose(np.asarray(out[:2]), 0.0, atol=1e-7)
    out_r = cp_encode_reference(pos, factors, RES)
    np.testing.assert_allclose(
        np.asarray(out[2:]), np.asarray(out_r[2:]), atol=1e-5
    )
    # gradients: zero the OOB rows' contribution
    g = jnp.ones((8, len(RES) * RANK), jnp.float32)

    def loss(fs):
        return jnp.sum(cp_encode(pos, fs, RES, 8) * g)

    def loss_ref(fs):
        feats = cp_encode_reference(pos, fs, RES)
        oob = jnp.any((pos < 0) | (pos > 1), axis=-1)
        return jnp.sum(jnp.where(oob[:, None], 0.0, feats) * g)

    gk = jax.grad(loss)(factors)
    gr = jax.grad(loss_ref)(factors)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_out_dtype_bf16():
    pos, factors = _setup()
    out = cp_encode(pos, factors, RES, 128, jnp.bfloat16)
    assert out.dtype == jnp.bfloat16
    out_r = cp_encode_reference(pos, factors, RES)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(out_r), atol=2e-2, rtol=2e-2
    )


def test_bf16_factors():
    pos, factors = _setup(dtype=jnp.bfloat16)
    out_k = cp_encode(pos, factors, RES, 128)
    out_r = cp_encode_reference(pos, factors, RES)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r), atol=2e-2, rtol=2e-2)


# ---------------------------------------------------------------------------
# fused density head (cp_density)
# ---------------------------------------------------------------------------


def _density_setup(m=260, seed=3, fd=2, h1=32, out=8):
    rng = np.random.default_rng(seed)
    pos = jnp.asarray(rng.uniform(-0.1, 1.1, size=(m, 3)).astype(np.float32))
    factors = tuple(
        jnp.asarray(rng.normal(0, 0.3, size=(3, r, RANK)).astype(np.float32))
        for r in RES
    )
    D = len(RES) * RANK + 3 * (1 + 2 * fd)
    w1 = jnp.asarray(rng.normal(0, 0.2, size=(D, h1)).astype(np.float32))
    w2 = jnp.asarray(rng.normal(0, 0.2, size=(h1, out)).astype(np.float32))
    return pos, factors, w1, w2, fd


def _density_reference(pos, factors, w1, w2, fd):
    """Unfused composition: cp reference + freq ladder + 2-layer MLP."""
    from ngp_tpu.ops.freq import freq_encode

    cp = cp_encode_reference(pos, factors, RES)
    oob = jnp.any((pos < 0.0) | (pos > 1.0), axis=-1)
    cp = jnp.where(oob[:, None], 0.0, cp)
    fr = freq_encode(2.0 * pos - 1.0, fd)
    feats = jnp.concatenate([cp, fr], axis=-1)
    h = jnp.maximum(feats @ w1, 0.0)
    return h @ w2


def test_cp_density_forward_parity():
    from ngp_tpu.ops.pallas.cp_kernels import cp_density

    pos, factors, w1, w2, fd = _density_setup()
    out_k = cp_density(pos, factors, w1, w2, RES, fd, 128)
    out_r = _density_reference(pos, factors, w1, w2, fd)
    np.testing.assert_allclose(
        np.asarray(out_k), np.asarray(out_r), atol=1e-4, rtol=1e-4
    )


def test_cp_density_grads_match_composition():
    """The custom vjp (saved feats/h1 residuals + shared per-bank
    Pallas backward) must match autodiff of the unfused composition for
    factors AND both MLP kernels."""
    from ngp_tpu.ops.pallas.cp_kernels import cp_density

    pos, factors, w1, w2, fd = _density_setup()
    g = jnp.asarray(
        np.random.default_rng(9).normal(size=(pos.shape[0], w2.shape[1]))
        .astype(np.float32)
    )

    def loss_fused(f, a, b):
        return jnp.vdot(cp_density(pos, f, a, b, RES, fd, 128), g)

    def loss_ref(f, a, b):
        return jnp.vdot(_density_reference(pos, f, a, b, fd), g)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(factors, w1, w2)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(factors, w1, w2)
    for a, b in zip(gf[0], gr[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(gr[1]),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gf[2]), np.asarray(gr[2]),
                               atol=1e-3, rtol=1e-3)


def test_make_fused_density_matches_module():
    """Trainer-level fused density path == model.apply density (same
    params), and None for non-cpgrid configs."""
    from ngp_tpu.config import NetworkConfig, RenderConfig
    from ngp_tpu.models.nerf import NeRFNetwork, make_fused_density

    render_cfg = RenderConfig(bound=1.0, turbo=True)
    net_cfg = NetworkConfig(
        encoding="cpgrid", use_bf16=False,
        cp_resolutions=(32, 64), cp_rank=16, cp_freq_degree=4,
    )
    model = NeRFNetwork(cfg=net_cfg, render=render_cfg)
    rng = np.random.default_rng(11)
    x0 = jnp.zeros((8, 3))
    params = model.init(jax.random.PRNGKey(0), x0, x0, method=NeRFNetwork.full_init)
    fused = make_fused_density(model, params)
    assert fused is not None
    x = jnp.asarray(rng.uniform(-1, 1, size=(64, 3)).astype(np.float32))
    s_f, g_f = fused(x)
    s_m, g_m = model.apply(params, x, method=NeRFNetwork.density)
    np.testing.assert_allclose(np.asarray(s_f), np.asarray(s_m),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(g_f, np.float32), np.asarray(g_m, np.float32),
        atol=1e-4, rtol=1e-4,
    )

    hash_model = NeRFNetwork(
        cfg=NetworkConfig(encoding="hashgrid", use_bf16=False),
        render=render_cfg,
    )
    hash_params = hash_model.init(
        jax.random.PRNGKey(1), x0, x0, method=NeRFNetwork.full_init
    )
    assert make_fused_density(hash_model, hash_params) is None


# ---------------------------------------------------------------------------
# fused eval radiance head (cp_sigma_rgb)
# ---------------------------------------------------------------------------


def test_cp_sigma_rgb_kernel_parity():
    """One-pass eval radiance kernel == the unfused composition
    (density -> trunc_exp/geo -> SH concat -> color MLP -> sigmoid)."""
    from ngp_tpu.ops.pallas.cp_kernels import cp_sigma_rgb
    from ngp_tpu.ops.sh import sh_encode

    pos, factors, w1, w2, fd = _density_setup()
    rng = np.random.default_rng(21)
    m = pos.shape[0]
    d = rng.normal(size=(m, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    sh_deg = 2
    geo = w2.shape[1] - 1
    dims = [sh_deg * sh_deg + geo, 16, 16, 3]
    color_ws = tuple(
        jnp.asarray(rng.normal(0, 0.3, size=(dims[i], dims[i + 1]))
                    .astype(np.float32))
        for i in range(3)
    )
    out_k = cp_sigma_rgb(pos, d, factors, w1, w2, color_ws, RES, fd,
                         sh_deg, 128)
    h = _density_reference(pos, factors, w1, w2, fd)
    sigma_r = jnp.exp(h[:, 0])
    c = jnp.concatenate([sh_encode(d, sh_deg), h[:, 1:]], axis=-1)
    for i, w in enumerate(color_ws):
        c = c @ w
        if i != 2:
            c = jnp.maximum(c, 0.0)
    rgb_r = jax.nn.sigmoid(c)
    assert out_k.shape == (m, 4)
    np.testing.assert_allclose(np.asarray(out_k[:, 0]), np.asarray(sigma_r),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out_k[:, 1:]), np.asarray(rgb_r),
                               atol=1e-5, rtol=1e-4)


def test_make_fused_sigma_rgb_matches_module():
    """Trainer-level fused eval radiance == model.apply density+color
    (same params); None for non-flagship configs."""
    from ngp_tpu.config import NetworkConfig, RenderConfig
    from ngp_tpu.models.nerf import NeRFNetwork, make_fused_sigma_rgb

    render_cfg = RenderConfig(bound=1.0, turbo=True)
    net_cfg = NetworkConfig(
        encoding="cpgrid", use_bf16=False,
        cp_resolutions=(32, 64), cp_rank=16, cp_freq_degree=4,
    )
    model = NeRFNetwork(cfg=net_cfg, render=render_cfg)
    rng = np.random.default_rng(23)
    x0 = jnp.zeros((8, 3))
    params = model.init(jax.random.PRNGKey(0), x0, x0,
                        method=NeRFNetwork.full_init)
    fused = make_fused_sigma_rgb(model, params)
    assert fused is not None
    x = jnp.asarray(rng.uniform(-1, 1, size=(64, 3)).astype(np.float32))
    d = rng.normal(size=(64, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    vals = fused(x, d)
    s_m, g_m = model.apply(params, x, method=NeRFNetwork.density)
    rgb_m = model.apply(params, d, g_m, method=NeRFNetwork.color)
    np.testing.assert_allclose(np.asarray(vals[:, 0]), np.asarray(s_m),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(vals[:, 1:]), np.asarray(rgb_m),
                               atol=1e-4, rtol=1e-4)

    hash_model = NeRFNetwork(
        cfg=NetworkConfig(encoding="hashgrid", use_bf16=False),
        render=render_cfg,
    )
    hash_params = hash_model.init(
        jax.random.PRNGKey(1), x0, x0, method=NeRFNetwork.full_init
    )
    assert make_fused_sigma_rgb(hash_model, hash_params) is None


def test_turbo_render_vals_fn_matches_unfused():
    """render_rays_grid_turbo(vals_fn=...) == the density/color pair on
    the same occupancy state and rays (the eval wiring contract)."""
    from ngp_tpu.config import NetworkConfig, RenderConfig
    from ngp_tpu.models.nerf import (
        NeRFNetwork, make_fused_density, make_fused_sigma_rgb,
    )
    from ngp_tpu.models.occupancy import (
        init_occupancy, render_rays_grid_turbo, update_occupancy,
    )

    render_cfg = RenderConfig(
        bound=1.0, turbo=True, grid_size=32, max_samples_per_ray=32,
    )
    net_cfg = NetworkConfig(
        encoding="cpgrid", use_bf16=False,
        cp_resolutions=(32, 64), cp_rank=16, cp_freq_degree=4,
    )
    model = NeRFNetwork(cfg=net_cfg, render=render_cfg)
    x0 = jnp.zeros((8, 3))
    params = model.init(jax.random.PRNGKey(2), x0, x0,
                        method=NeRFNetwork.full_init)

    density_fn = make_fused_density(model, params)
    if density_fn is None:
        def density_fn(x):
            return model.apply(params, x, method=NeRFNetwork.density)

    def color_fn(d, geo):
        return model.apply(params, d, geo, method=NeRFNetwork.color)

    vals_fn = make_fused_sigma_rgb(model, params)
    assert vals_fn is not None

    occ = init_occupancy(render_cfg)
    occ = update_occupancy(
        occ, density_fn, render_cfg, jax.random.PRNGKey(3), 0
    )
    rng = np.random.default_rng(29)
    n = 64
    ro = jnp.asarray(rng.uniform(-0.2, 0.2, size=(n, 3)).astype(np.float32))
    rd = rng.normal(size=(n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    rd = jnp.asarray(rd)
    out_u = render_rays_grid_turbo(
        density_fn, color_fn, ro, rd, occ, render_cfg,
        budget=n * 8,
    )
    out_f = render_rays_grid_turbo(
        density_fn, color_fn, ro, rd, occ, render_cfg,
        budget=n * 8, vals_fn=vals_fn,
    )
    np.testing.assert_allclose(
        np.asarray(out_f["image"]), np.asarray(out_u["image"]),
        atol=1e-4, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out_f["depth"]), np.asarray(out_u["depth"]),
        atol=1e-4, rtol=1e-4,
    )

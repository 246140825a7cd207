"""Hash-grid encoder tests: geometry formulas, manual trilinear
reference, OOB handling, and finite-difference gradcheck (mirrors the
reference's testing/test_hashgrid_grad.py gradcheck, SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ngp_tpu.ops import GridConfig, grid_encode


def test_offsets_match_reference_formula():
    cfg = GridConfig(
        input_dim=3, num_levels=16, level_dim=2, per_level_scale=2.0,
        base_resolution=16, log2_hashmap_size=19,
    )
    offs = cfg.offsets
    assert len(offs) == 17
    # level 0: res 16 -> (16+1)^3 = 4913 -> ceil/8*8 = 4920
    assert offs[1] - offs[0] == 4920
    # high levels saturate at 2^19 (already /8)
    assert offs[16] - offs[15] == 2**19
    # monotonically non-decreasing level sizes
    sizes = np.diff(offs)
    assert np.all(sizes[1:] >= sizes[:-1])


def test_desired_resolution_overrides_scale():
    cfg = GridConfig(base_resolution=16, num_levels=16, desired_resolution=2048)
    assert abs(cfg.level_resolution(15) - 2049) <= 1
    np.testing.assert_allclose(cfg.per_level_scale, 2 ** (np.log2(2048 / 16) / 15))


def test_dense_level_matches_manual_trilinear():
    # tiled grid, one level, small dense table -> exact trilinear interp
    cfg = GridConfig(
        input_dim=3, num_levels=1, level_dim=4, per_level_scale=1.0,
        base_resolution=4, log2_hashmap_size=19, gridtype="tiled",
        align_corners=True,
    )
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(cfg.num_rows, 4)).astype(np.float32)
    x = rng.uniform(0.05, 0.95, size=(32, 3)).astype(np.float32)
    out = np.asarray(grid_encode(jnp.asarray(x), jnp.asarray(emb), cfg))

    # manual: scale = H - 1 (align_corners), dense row-major with dim0 fastest
    scale = cfg.base_resolution - 1.0
    res = cfg.level_resolution(0)
    pos = x * scale
    p0 = np.floor(pos).astype(np.int64)
    f = pos - p0
    expect = np.zeros((32, 4), dtype=np.float32)
    for corner in range(8):
        ox, oy, oz = corner & 1, (corner >> 1) & 1, (corner >> 2) & 1
        w = (
            (f[:, 0] if ox else 1 - f[:, 0])
            * (f[:, 1] if oy else 1 - f[:, 1])
            * (f[:, 2] if oz else 1 - f[:, 2])
        )
        idx = (p0[:, 0] + ox) + (p0[:, 1] + oy) * res + (p0[:, 2] + oz) * res * res
        hashmap_size = cfg.offsets[1] - cfg.offsets[0]
        expect += w[:, None] * emb[idx % hashmap_size]
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-6)


def test_oob_inputs_are_zero():
    cfg = GridConfig(num_levels=2, level_dim=2, base_resolution=4)
    emb = cfg.init(jax.random.PRNGKey(0)) + 1.0  # nonzero table
    x = jnp.asarray([[0.5, 0.5, 1.5], [-0.1, 0.5, 0.5], [0.5, 0.5, 0.5]])
    out = np.asarray(grid_encode(x, emb, cfg))
    assert np.all(out[0] == 0) and np.all(out[1] == 0)
    assert np.any(out[2] != 0)


@pytest.mark.parametrize("gridtype,interp", [
    ("hash", "linear"),
    ("tiled", "linear"),
    ("hash", "smoothstep"),
])
def test_gradcheck_embeddings_and_inputs(gridtype, interp):
    """Finite-difference gradcheck in float64 (conftest keeps x64 off
    globally; enable it locally for precision)."""
    with jax.enable_x64(True):
        cfg = GridConfig(
            input_dim=3, num_levels=4, level_dim=2, per_level_scale=1.5,
            base_resolution=4, log2_hashmap_size=7, gridtype=gridtype,
            interpolation=interp,
        )
        rng = np.random.default_rng(42)
        emb = jnp.asarray(rng.normal(size=(cfg.num_rows, 2)), dtype=jnp.float64)
        x = jnp.asarray(rng.uniform(0.1, 0.9, size=(8, 3)), dtype=jnp.float64)
        cot = jnp.asarray(rng.normal(size=(8, cfg.output_dim)), dtype=jnp.float64)

        def f_emb(e):
            return jnp.vdot(grid_encode(x, e, cfg), cot)

        g = jax.grad(f_emb)(emb)
        # directional finite difference along 5 random directions
        for seed in range(5):
            v = jnp.asarray(np.random.default_rng(seed).normal(size=emb.shape))
            eps = 1e-6
            fd = (f_emb(emb + eps * v) - f_emb(emb - eps * v)) / (2 * eps)
            np.testing.assert_allclose(float(jnp.vdot(g, v)), float(fd), rtol=1e-5, atol=1e-7)

        def f_x(xx):
            return jnp.vdot(grid_encode(xx, emb, cfg), cot)

        gx = jax.grad(f_x)(x)
        for seed in range(5):
            v = jnp.asarray(np.random.default_rng(100 + seed).normal(size=x.shape)) * 1e-3
            eps = 1e-6
            fd = (f_x(x + eps * v) - f_x(x - eps * v)) / (2 * eps)
            np.testing.assert_allclose(float(jnp.vdot(gx, v)), float(fd), rtol=1e-4, atol=1e-8)


def test_batch_shape_polymorphism():
    cfg = GridConfig(num_levels=2, level_dim=2, base_resolution=4)
    emb = cfg.init(jax.random.PRNGKey(0))
    x = jnp.full((2, 5, 3), 0.5)
    out = grid_encode(x, emb, cfg)
    assert out.shape == (2, 5, cfg.output_dim)

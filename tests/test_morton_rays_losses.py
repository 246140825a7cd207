"""Tests for morton codes, packbits, ray/AABB math, losses and
trunc_exp against slow independent references."""

import numpy as np
import jax
import jax.numpy as jnp

from ngp_tpu.ops import (
    eff_distloss,
    huber_loss,
    mape_loss,
    morton3d,
    morton3d_invert,
    near_far_from_aabb,
    packbits,
    sph_from_ray,
    trunc_exp,
    unpackbits,
)


def _slow_morton(coords):
    out = []
    for cx, cy, cz in coords:
        code = 0
        for bit in range(10):
            code |= ((cx >> bit) & 1) << (3 * bit)
            code |= ((cy >> bit) & 1) << (3 * bit + 1)
            code |= ((cz >> bit) & 1) << (3 * bit + 2)
        out.append(code)
    return np.array(out, dtype=np.int32)


def test_morton_roundtrip_and_value():
    rng = np.random.default_rng(0)
    coords = rng.integers(0, 128, size=(256, 3)).astype(np.int32)
    codes = np.asarray(morton3d(jnp.asarray(coords)))
    np.testing.assert_array_equal(codes, _slow_morton(coords))
    inv = np.asarray(morton3d_invert(jnp.asarray(codes)))
    np.testing.assert_array_equal(inv, coords)


def test_packbits_roundtrip():
    rng = np.random.default_rng(1)
    grid = rng.uniform(-1, 1, size=(4096,)).astype(np.float32)
    thresh = 0.1
    bf = np.asarray(packbits(jnp.asarray(grid), thresh))
    assert bf.dtype == np.uint8 and bf.shape == (512,)
    expect_bits = grid > thresh
    got_bits = np.asarray(unpackbits(jnp.asarray(bf)))
    np.testing.assert_array_equal(got_bits, expect_bits)
    # explicit bit order: cell 8n+i lives in bit i of byte n
    assert bool(bf[0] & 1) == bool(grid[0] > thresh)
    assert bool(bf[0] & 2) == bool(grid[1] > thresh)


def test_near_far_from_aabb_brute_force():
    rng = np.random.default_rng(2)
    n = 512
    o = rng.uniform(-3, 3, size=(n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    aabb = np.array([-1, -1, -1, 1, 1, 1], dtype=np.float32)
    near, far = near_far_from_aabb(jnp.asarray(o), jnp.asarray(d), jnp.asarray(aabb))
    near, far = np.asarray(near), np.asarray(far)

    # brute force: dense t sampling, find inside-interval
    ts = np.linspace(0.0, 20.0, 20001, dtype=np.float32)
    pts = o[:, None, :] + ts[None, :, None] * d[:, None, :]
    inside = np.all((pts >= -1) & (pts <= 1), axis=-1)
    hit = inside.any(axis=1)
    miss = ~hit
    # misses are either slab-disjoint (flagged 1e10, matching the CUDA
    # reference) or behind-origin (far < near -> empty march interval)
    assert np.all((near[miss] >= 1e9) | (far[miss] < near[miss]))
    t_in = np.where(inside, ts[None, :], np.inf).min(axis=1)
    t_out = np.where(inside, ts[None, :], -np.inf).max(axis=1)
    sel = hit & (t_in > 0.06)  # skip rays whose entry is clamped by min_near
    np.testing.assert_allclose(near[sel], t_in[sel], atol=5e-3)
    np.testing.assert_allclose(far[sel], t_out[sel], atol=5e-3)


def test_sph_from_ray_on_sphere():
    rng = np.random.default_rng(3)
    n = 128
    o = rng.uniform(-0.3, 0.3, size=(n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    radius = 2.5
    coords = np.asarray(sph_from_ray(jnp.asarray(o), jnp.asarray(d), radius))
    assert coords.shape == (n, 2)
    assert np.all(coords >= -1.0 - 1e-5) and np.all(coords <= 1.0 + 1e-5)
    # reconstruct the intersection point from (theta, phi), check radius
    theta = (coords[:, 0] + 1) * np.pi / 2
    phi = coords[:, 1] * np.pi
    p = radius * np.stack(
        [np.sin(theta) * np.cos(phi), np.cos(theta), np.sin(theta) * np.sin(phi)],
        axis=-1,
    )
    # p must lie on the ray: (p - o) parallel to d with positive t
    v = p - o
    t = np.sum(v * d, axis=-1)
    np.testing.assert_allclose(v, t[:, None] * d, atol=1e-3)
    assert np.all(t > 0)


def test_losses_against_naive():
    rng = np.random.default_rng(4)
    pred = jnp.asarray(rng.uniform(0.1, 2.0, size=(64, 1)).astype(np.float32))
    tgt = jnp.asarray(rng.uniform(0.1, 2.0, size=(64, 1)).astype(np.float32))
    np.testing.assert_allclose(
        float(mape_loss(pred, tgt)),
        float(np.mean(np.abs(np.asarray(pred) - np.asarray(tgt)) / (np.abs(np.asarray(tgt)) + 1e-2))),
        rtol=1e-5,
    )
    # huber: check both branches
    h = float(huber_loss(pred, tgt, delta=0.1))
    err = np.abs(np.asarray(pred) - np.asarray(tgt))
    expect = np.where(err > 0.1, err - 0.05, 0.5 / 0.1 * err**2).mean()
    np.testing.assert_allclose(h, expect, rtol=1e-5)


def test_eff_distloss_matches_quadratic_form():
    rng = np.random.default_rng(5)
    B, N = 8, 32
    w = rng.uniform(0, 0.2, size=(B, N)).astype(np.float32)
    t = np.sort(rng.uniform(0.1, 2.0, size=(B, N)).astype(np.float32), axis=-1)
    delta = rng.uniform(0.01, 0.05, size=(B, N)).astype(np.float32)
    got = float(eff_distloss(jnp.asarray(w), jnp.asarray(t), jnp.asarray(delta)))
    # naive O(N^2)
    naive = 0.0
    for b in range(B):
        cross = np.sum(w[b, :, None] * w[b, None, :] * np.abs(t[b, :, None] - t[b, None, :]))
        naive += cross + np.sum(w[b] ** 2 * delta[b]) / 3.0
    naive /= B
    np.testing.assert_allclose(got, naive, rtol=1e-4)


def test_trunc_exp_grad():
    x = jnp.asarray([-20.0, -1.0, 0.0, 1.0, 20.0], dtype=jnp.float32)
    y = trunc_exp(x)
    np.testing.assert_allclose(np.asarray(y), np.exp(np.asarray(x)), rtol=1e-6)
    g = jax.grad(lambda v: trunc_exp(v).sum())(x)
    expect = np.exp(np.clip(np.asarray(x), -15, 15))
    np.testing.assert_allclose(np.asarray(g), expect, rtol=1e-6)

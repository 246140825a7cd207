"""Metric tests: PSNR closed form, SSIM properties + numpy cross-check,
meter protocol."""

import numpy as np
import jax.numpy as jnp

from ngp_tpu.training.metrics import PSNRMeter, SSIMMeter, psnr, ssim


def test_psnr_closed_form():
    a = jnp.zeros((8, 8, 3))
    b = jnp.full((8, 8, 3), 0.1)
    np.testing.assert_allclose(float(psnr(a, b)), -10 * np.log10(0.01), rtol=1e-5)
    assert float(psnr(a, a)) > 100


def test_ssim_properties():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(size=(32, 32, 3)).astype(np.float32))
    assert abs(float(ssim(img, img)) - 1.0) < 1e-5
    noisy = img + jnp.asarray(rng.normal(0, 0.1, size=(32, 32, 3)).astype(np.float32))
    s = float(ssim(img, jnp.clip(noisy, 0, 1)))
    assert 0.0 < s < 0.99
    # more noise -> lower ssim
    noisier = img + jnp.asarray(rng.normal(0, 0.4, size=(32, 32, 3)).astype(np.float32))
    assert float(ssim(img, jnp.clip(noisier, 0, 1))) < s


def test_ssim_matches_numpy_reference():
    """Cross-check against a direct numpy implementation of the
    Gaussian-window SSIM (independent of the jax conv path)."""
    rng = np.random.default_rng(1)
    a = rng.uniform(size=(24, 24, 1)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.05, a.shape).astype(np.float32), 0, 1)

    def gauss_k(size=11, sigma=1.5):
        x = np.arange(size) - (size - 1) / 2
        g = np.exp(-(x**2) / (2 * sigma**2))
        g /= g.sum()
        return np.outer(g, g)

    k = gauss_k()

    def filt(img):
        H, W = img.shape
        out = np.zeros((H - 10, W - 10))
        for i in range(H - 10):
            for j in range(W - 10):
                out[i, j] = (img[i : i + 11, j : j + 11] * k).sum()
        return out

    c1, c2 = 0.01**2, 0.03**2
    x, y = a[..., 0].astype(np.float64), b[..., 0].astype(np.float64)
    mx, my = filt(x), filt(y)
    vx = filt(x * x) - mx**2
    vy = filt(y * y) - my**2
    cxy = filt(x * y) - mx * my
    ref = np.mean(((2 * mx * my + c1) * (2 * cxy + c2)) / ((mx**2 + my**2 + c1) * (vx + vy + c2)))
    got = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_meter_protocol():
    m = PSNRMeter()
    a = np.zeros((8, 8, 3), np.float32)
    b = np.full((8, 8, 3), 0.1, np.float32)
    m.update(a, b)
    m.update(a, a)
    assert m.N == 2
    assert "PSNR" in m.report()
    m.clear()
    assert m.N == 0

    s = SSIMMeter()
    s.update(np.stack([a, a]), np.stack([a, a]))  # batched [B, H, W, C]
    assert s.N == 2 and abs(s.measure() - 1.0) < 1e-5

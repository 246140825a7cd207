"""Metric tests: PSNR closed form, SSIM properties + numpy cross-check,
meter protocol."""

import numpy as np
import pytest
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


class TestLPIPS:
    """JAX AlexNet-LPIPS (ngp_tpu.training.lpips) — architecture and
    metric properties with random weights (pretrained weights cannot be
    downloaded in this image); torch-checkpoint conversion round-trip."""

    def _params(self):
        import jax
        from ngp_tpu.training.lpips import random_params

        return random_params(jax.random.PRNGKey(0))

    def test_identity_zero_and_positive(self):
        import jax
        import jax.numpy as jnp
        from ngp_tpu.training.lpips import lpips

        params = self._params()
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.random((2, 64, 64, 3), np.float32))
        y = jnp.asarray(rng.random((2, 64, 64, 3), np.float32))
        d_xx = np.asarray(lpips(params, x, x))
        d_xy = np.asarray(lpips(params, x, y))
        np.testing.assert_allclose(d_xx, 0.0, atol=1e-6)
        assert (d_xy > 1e-4).all()

    def test_differentiable_and_jittable(self):
        import jax
        import jax.numpy as jnp
        from ngp_tpu.training.lpips import lpips

        params = self._params()
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.random((1, 64, 64, 3), np.float32))
        y = jnp.asarray(rng.random((1, 64, 64, 3), np.float32))
        g = jax.jit(jax.grad(lambda a: lpips(params, a, y).sum()))(x)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0

    def test_feature_shapes_match_alexnet(self):
        import jax.numpy as jnp
        from ngp_tpu.training.lpips import _features, _CHANNELS

        params = self._params()
        taps = _features(params, jnp.zeros((1, 64, 64, 3)))
        assert tuple(t.shape[-1] for t in taps) == _CHANNELS
        # torchvision AlexNet spatial sizes for 64x64 input: 15, 7, 3, 3, 3
        assert [t.shape[1] for t in taps] == [15, 7, 3, 3, 3]

    def test_torch_checkpoint_conversion(self, tmp_path):
        torch = pytest.importorskip("torch")
        from ngp_tpu.training.lpips import _ALEX, load_torch_weights

        sd = {}
        c_in = 3
        tv_idx = (0, 3, 6, 8, 10)
        g = torch.Generator().manual_seed(0)
        for i, (c_out, k, _, _, _) in enumerate(_ALEX):
            sd[f"features.{tv_idx[i]}.weight"] = torch.randn(c_out, c_in, k, k, generator=g)
            sd[f"features.{tv_idx[i]}.bias"] = torch.randn(c_out, generator=g)
            sd[f"lin{i}.model.1.weight"] = torch.rand(1, c_out, 1, 1, generator=g)
            c_in = c_out
        path = str(tmp_path / "lpips.pth")
        torch.save(sd, path)
        params = load_torch_weights(path)
        assert params["conv0_w"].shape == (11, 11, 3, 64)
        assert params["lin4_w"].shape == (256,)
        np.testing.assert_allclose(
            params["conv1_w"],
            np.transpose(sd["features.3.weight"].numpy(), (2, 3, 1, 0)),
        )

    def test_meter_with_params(self):
        from ngp_tpu.training.metrics import LPIPSMeter

        m = LPIPSMeter(params=self._params())
        rng = np.random.default_rng(2)
        a = rng.random((64, 64, 3), np.float32)
        m.update(a, a)
        assert m.measure() == pytest.approx(0.0, abs=1e-6)
        m.update(a, rng.random((64, 64, 3), np.float32))
        assert m.measure() > 0

    def test_meter_raises_without_weights(self):
        from ngp_tpu.training.metrics import LPIPSMeter

        m = LPIPSMeter()
        with pytest.raises(RuntimeError):
            m.update(np.zeros((8, 8, 3)), np.zeros((8, 8, 3)))


def test_ssim_white_background_regression():
    """Regression: TPU convs default to bf16 operands, which made the
    SSIM variance terms (differences of ~1.0 blurs vs c2=9e-4) garbage
    on mostly-white NeRF eval frames (measured 1.05-2.5 on v5e). With
    forced f32 precision SSIM must stay <= 1 and match a numpy
    windowless bound on near-identical images."""
    rng = np.random.default_rng(0)
    base = np.ones((64, 64, 3), np.float32)
    base[20:40, 20:40] = rng.random((20, 20, 3))
    noisy = np.clip(base + rng.normal(0, 0.01, base.shape).astype(np.float32), 0, 1)
    from ngp_tpu.training.metrics import ssim

    v = float(ssim(jnp.asarray(base), jnp.asarray(noisy)))
    assert 0.8 < v <= 1.0
    assert float(ssim(jnp.asarray(base), jnp.asarray(base))) == pytest.approx(1.0, abs=1e-5)

"""CCNeRF tests: residual consistency, finalize/compress equivalence,
composition, and a short rank-residual training run."""

import numpy as np
import jax
import jax.numpy as jnp

from ngp_tpu.config import RenderConfig, TrainConfig
from ngp_tpu.models.ccnerf import CCNeRF, CCNeRFConfig, init_ccnerf


def _small_cfg():
    return CCNeRFConfig(
        resolution=(24, 24, 24),
        degree=2,
        rank_vec_density=(8, 8, 8),
        rank_mat_density=(0, 2, 4),
        rank_vec=(8, 8, 8),
        rank_mat=(0, 2, 4),
    )


def _xd(n=32, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(-0.9, 0.9, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return x, jnp.asarray(d)


def test_residual_last_slice_equals_full():
    cfg = _small_cfg()
    model = CCNeRF(cfg)
    params = init_ccnerf(jax.random.PRNGKey(0), cfg)
    x, d = _xd()
    sig_r, rgb_r = model.sigma_rgb(params, x, d, residual=True)
    sig_f, rgb_f = model.sigma_rgb(params, x, d, residual=False)
    assert sig_r.shape == (3, 32) and rgb_r.shape == (3, 32, 3)
    np.testing.assert_allclose(np.asarray(sig_r[-1]), np.asarray(sig_f), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(rgb_r[-1]), np.asarray(rgb_f), rtol=1e-5, atol=1e-6)


def test_finalize_preserves_field_and_compress_degrades_gracefully():
    cfg = _small_cfg()
    model = CCNeRF(cfg)
    params = init_ccnerf(jax.random.PRNGKey(1), cfg)
    x, d = _xd(64, seed=1)
    sig_before, rgb_before = model.sigma_rgb(params, x, d, residual=False)

    fused = model.finalize(params)
    assert model.finalized and model.cfg.K == 1
    sig_after, rgb_after = model.sigma_rgb(fused, x, d, residual=False)
    np.testing.assert_allclose(np.asarray(sig_after), np.asarray(sig_before), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(rgb_after), np.asarray(rgb_before), rtol=1e-4, atol=1e-5)

    # compress to a rank prefix: still runs, shapes shrink
    small = model.compress(fused, (4, 2, 4, 2))
    assert small["vec"][0]["S"].shape[1] == 4
    sig_c, rgb_c = model.sigma_rgb(small, x, d, residual=False)
    assert sig_c.shape == (64,) and rgb_c.shape == (64, 3)


def test_compose_two_objects():
    cfg = _small_cfg()
    m1 = CCNeRF(cfg)
    p1 = init_ccnerf(jax.random.PRNGKey(2), cfg)
    m2 = CCNeRF(cfg)
    p2 = init_ccnerf(jax.random.PRNGKey(3), cfg)
    scene = CCNeRF(cfg).compose([(m1, p1), (m2, p2)])
    x, d = _xd(16, seed=2)
    sigma, rgb = scene.sigma_rgb(None, x, d)
    assert sigma.shape == (16,) and rgb.shape == (16, 3)
    # with a translation transform, outputs change
    T = np.eye(4, dtype=np.float32)
    T[0, 3] = 0.5
    scene2 = CCNeRF(cfg).compose([(m1, p1), (m2, p2)], transforms=[None, (T, np.eye(3, dtype=np.float32))])
    sigma2, _ = scene2.sigma_rgb(None, x, d)
    assert np.abs(np.asarray(sigma) - np.asarray(sigma2)).max() > 0


def test_ccnerf_trainer_e2e(tmp_path):
    from ngp_tpu.data.nerf_dataset import NeRFDataset
    from ngp_tpu.data.synthetic import make_synthetic_dataset
    from ngp_tpu.training.ccnerf import CCNeRFTrainer

    root = str(tmp_path / "synth")
    make_synthetic_dataset(root, n_train=6, n_val=1, n_test=1, H=48, W=48, num_steps=192)
    train_ds = NeRFDataset(root, split="train", scale=0.8)
    val_ds = NeRFDataset(root, split="val", scale=0.8)

    render_cfg = RenderConfig(
        bound=1.0, min_near=0.05, dt_gamma=0.0, max_steps=128,
        max_samples_per_ray=48, grid_size=16, density_thresh=10.0,
    )
    train_cfg = TrainConfig(
        iters=200, lr=2e-2, num_rays=512, workspace=str(tmp_path / "ws"),
        update_extra_interval=16,
    )
    cfg = _small_cfg()
    model = CCNeRF(cfg)
    trainer = CCNeRFTrainer(
        model, render_cfg, train_cfg, log_every=10**9, use_tensorboard=False
    )
    trainer.ensure_initialized()
    before = trainer.evaluate(val_ds, max_frames=1)["psnr"]
    trainer.train_on_dataset(train_ds, valid_ds=None, max_epochs=20)  # 120 steps
    after = trainer.evaluate(val_ds, max_frames=1)["psnr"]
    print(f"ccnerf PSNR: {before:.2f} -> {after:.2f}")
    assert after > before + 3.0


def test_ccnerf_trainer_e2e_turbo(tmp_path):
    """CCNeRF residual training through the TURBO march: one shared
    march/compaction, per-rank-prefix placement + composite
    (render_rays_grid_turbo_multi). Same scene/assertions as the v1
    e2e."""
    from ngp_tpu.data.nerf_dataset import NeRFDataset
    from ngp_tpu.data.synthetic import make_synthetic_dataset
    from ngp_tpu.training.ccnerf import CCNeRFTrainer

    root = str(tmp_path / "synth")
    make_synthetic_dataset(root, n_train=6, n_val=1, n_test=1, H=48, W=48, num_steps=192)
    train_ds = NeRFDataset(root, split="train", scale=0.8)
    val_ds = NeRFDataset(root, split="val", scale=0.8)

    render_cfg = RenderConfig(
        bound=1.0, min_near=0.05, dt_gamma=0.0, max_steps=64,
        max_samples_per_ray=16, grid_size=16, density_thresh=10.0,
        turbo=True, coarse_candidates=48, crossing_slots=16,
        compact_mean_samples=8,
    )
    train_cfg = TrainConfig(
        iters=200, lr=2e-2, num_rays=512, workspace=str(tmp_path / "ws"),
        update_extra_interval=16,
    )
    cfg = _small_cfg()
    model = CCNeRF(cfg)
    trainer = CCNeRFTrainer(
        model, render_cfg, train_cfg, log_every=10**9, use_tensorboard=False
    )
    trainer.ensure_initialized()
    before = trainer.evaluate(val_ds, max_frames=1)["psnr"]
    trainer.train_on_dataset(train_ds, valid_ds=None, max_epochs=20)  # 120 steps
    after = trainer.evaluate(val_ds, max_frames=1)["psnr"]
    print(f"ccnerf-turbo PSNR: {before:.2f} -> {after:.2f}")
    assert after > before + 3.0


def test_compose_batched_sample_shapes():
    """Composed scenes must accept [rays, samples, 3] inputs like the
    march produces (regression: unflattened compose broke matmuls)."""
    cfg = _small_cfg()
    m1 = CCNeRF(cfg)
    p1 = init_ccnerf(jax.random.PRNGKey(4), cfg)
    scene = CCNeRF(cfg).compose([(m1, p1)])
    x = jnp.zeros((4, 8, 3))
    d = jnp.broadcast_to(jnp.asarray([1.0, 0, 0]), (4, 8, 3))
    sigma, rgb = scene.sigma_rgb(None, x, d)
    assert sigma.shape == (4, 8) and rgb.shape == (4, 8, 3)
    s2, geo = scene.density(None, x)
    assert s2.shape == (4, 8) and geo.shape == (4, 8, 3)

"""TensoRF family tests: VM field math, upsample/shrink param
transforms, two-group optimizer, and a short e2e training run with a
mid-run progressive upsample."""

import numpy as np
import jax
import jax.numpy as jnp

from ngp_tpu.config import RenderConfig, TrainConfig
from ngp_tpu.models.tensorf import (
    TensoRFCPNetwork,
    TensoRFNetwork,
    _vm_resolution,
    upsample_vm_params,
)


def _init_vm(res=16, **kw):
    model = TensoRFNetwork(
        resolution=(res, res, res), sigma_rank=(4, 4, 4), color_rank=(8, 8, 8),
        hidden_dim=32, **kw,
    )
    x = jnp.zeros((8, 3))
    d = jnp.concatenate([jnp.ones((8, 1)), jnp.zeros((8, 2))], -1)
    aabb = jnp.asarray([-1.0, -1, -1, 1, 1, 1])
    params = model.init(jax.random.PRNGKey(0), x, d, aabb, method=TensoRFNetwork.full_init)
    return model, params, aabb


def test_vm_forward_shapes_and_range():
    model, params, aabb = _init_vm()
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3), minval=-1, maxval=1)
    d = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    sigma, rgb = model.apply(params, x, d, aabb)
    assert sigma.shape == (32,) and rgb.shape == (32, 3)
    assert np.all(np.asarray(sigma) >= 0)
    assert np.all((np.asarray(rgb) >= 0) & (np.asarray(rgb) <= 1))
    l1 = model.apply(params, method=TensoRFNetwork.density_loss)
    assert float(l1) > 0


def test_vm_density_is_separable_product():
    """With rank-1 factors set by hand, sigma_feat must equal the sum
    over components of plane(x_pair) * line(x_axis)."""
    model, params, aabb = _init_vm(res=8)
    x = jnp.asarray([[0.1, -0.3, 0.5]])
    sigma, _ = model.apply(params, x, aabb, method=TensoRFNetwork.density)
    # brute-force recompute via the public pieces
    from ngp_tpu.models.tensorf import MAT_IDS, VEC_IDS
    from ngp_tpu.ops.interp import sample_1d, sample_2d

    p = params["params"]
    total = 0.0
    for i in range(3):
        m0, m1 = MAT_IDS[i]
        uv = jnp.asarray([[x[0, m0], x[0, m1]]])
        pf = sample_2d(p[f"sigma_mat_{i}"], uv)
        lf = sample_1d(p[f"sigma_vec_{i}"], x[:, VEC_IDS[i]])
        total = total + jnp.sum(pf * lf)
    np.testing.assert_allclose(float(jnp.log(sigma[0])), float(total), atol=1e-5)


def test_upsample_preserves_field():
    """Bilinear upsample must (approximately) preserve the represented
    field at query points."""
    model, params, aabb = _init_vm(res=16)
    x = jax.random.uniform(jax.random.PRNGKey(2), (64, 3), minval=-0.9, maxval=0.9)
    before, _ = model.apply(params, x, aabb, method=TensoRFNetwork.density)
    up = upsample_vm_params(params, (31, 31, 31))
    assert _vm_resolution(up) == (31, 31, 31)
    model_up = model.clone(resolution=(31, 31, 31))
    after, _ = model_up.apply(up, x, aabb, method=TensoRFNetwork.density)
    # align_corners upsample to 2n-1 is exact at original sample points
    # and near-exact elsewhere for bilinear fields
    np.testing.assert_allclose(np.asarray(after), np.asarray(before), rtol=0.08, atol=0.05)


def test_cp_forward():
    model = TensoRFCPNetwork(resolution=(16, 16, 16), sigma_rank=8, color_rank=16, hidden_dim=32)
    x = jnp.zeros((8, 3))
    d = jnp.concatenate([jnp.ones((8, 1)), jnp.zeros((8, 2))], -1)
    aabb = jnp.asarray([-1.0, -1, -1, 1, 1, 1])
    params = model.init(jax.random.PRNGKey(0), x, d, aabb, method=TensoRFCPNetwork.full_init)
    sigma, rgb = model.apply(params, x, d, aabb)
    assert sigma.shape == (8,) and rgb.shape == (8, 3)


def test_tensorf_trainer_e2e_with_upsample(tmp_path):
    from ngp_tpu.data.nerf_dataset import NeRFDataset
    from ngp_tpu.data.synthetic import make_synthetic_dataset
    from ngp_tpu.training.tensorf import TensoRFTrainer

    root = str(tmp_path / "synth")
    make_synthetic_dataset(root, n_train=6, n_val=1, n_test=1, H=64, W=64, num_steps=256)
    train_ds = NeRFDataset(root, split="train", scale=0.8)
    val_ds = NeRFDataset(root, split="val", scale=0.8)

    render_cfg = RenderConfig(
        bound=1.0, min_near=0.05, dt_gamma=0.0, max_steps=128,
        max_samples_per_ray=64, grid_size=32, density_thresh=10.0,
    )
    train_cfg = TrainConfig(
        iters=200, lr=2e-2, num_rays=1024, workspace=str(tmp_path / "ws"),
        update_extra_interval=8,
    )
    model = TensoRFNetwork(
        resolution=(32, 32, 32), sigma_rank=(4, 4, 4), color_rank=(12, 12, 12),
        hidden_dim=64,
    )
    trainer = TensoRFTrainer(
        model, render_cfg, train_cfg,
        upsample_model_steps=[60],  # exercise shrink+upsample mid-run
        resolution0=32, resolution1=48,
        log_every=10**9, use_tensorboard=False,
    )
    trainer.ensure_initialized()
    before = trainer.evaluate(val_ds, max_frames=1)["psnr"]
    trainer.train_on_dataset(train_ds, valid_ds=None, max_epochs=20)  # 120 steps
    after = trainer.evaluate(val_ds, max_frames=1)["psnr"]
    print(f"tensoRF PSNR: {before:.2f} -> {after:.2f}, reso {trainer.current_resolution}")
    assert after > before + 4.0
    assert trainer.current_resolution == (48, 48, 48)


def test_tensorf_checkpoint_resolution_roundtrip(tmp_path):
    """Checkpoints store the factor resolution + aabb; a fresh trainer
    at the base resolution resizes itself before loading
    (tensoRF/utils.py:247, :350 parity)."""
    from ngp_tpu.data.nerf_dataset import NeRFDataset
    from ngp_tpu.data.synthetic import make_synthetic_dataset
    from ngp_tpu.training.tensorf import TensoRFTrainer

    root = str(tmp_path / "synth")
    make_synthetic_dataset(root, n_train=3, n_val=1, n_test=1, H=40, W=40, num_steps=96)
    train_ds = NeRFDataset(root, split="train", scale=0.8)

    render_cfg = RenderConfig(
        bound=1.0, min_near=0.05, dt_gamma=0.0, max_steps=64,
        max_samples_per_ray=32, grid_size=16, density_thresh=10.0,
    )
    train_cfg = TrainConfig(iters=60, lr=2e-2, num_rays=256, workspace=str(tmp_path / "ws"))

    def mk():
        model = TensoRFNetwork(
            resolution=(16, 16, 16), sigma_rank=(2, 2, 2), color_rank=(4, 4, 4),
            hidden_dim=32,
        )
        return TensoRFTrainer(
            model, render_cfg, train_cfg, upsample_model_steps=[4],
            resolution0=16, resolution1=24, log_every=10**9, use_tensorboard=False,
        )

    t1 = mk()
    t1.ckpt_min_interval_s = 0.0
    t1.train_on_dataset(train_ds, valid_ds=None, max_epochs=3)  # crosses the upsample
    assert t1.current_resolution == (24, 24, 24)
    r1 = t1.render_frame(train_ds.poses[0], train_ds.intrinsics, 16, 16)[0]

    t2 = mk()
    assert t2.load_checkpoint()
    assert t2.current_resolution == (24, 24, 24)
    np.testing.assert_allclose(t2.aabb, t1.aabb, atol=1e-6)
    r2 = t2.render_frame(train_ds.poses[0], train_ds.intrinsics, 16, 16)[0]
    np.testing.assert_allclose(r2, r1, atol=1e-5)


def test_tensorf_trains_on_turbo_march(tmp_path):
    """TensoRF through the TURBO march (render_rays_grid_turbo is
    model-agnostic: density_fn/color_fn callbacks — the same flagship
    path the NeRF workload uses). The reference runs TensoRF through
    the same run_cuda marcher as NeRF (nerf/renderer.py:256)."""
    from ngp_tpu.data.nerf_dataset import NeRFDataset
    from ngp_tpu.data.synthetic import make_synthetic_dataset
    from ngp_tpu.training.tensorf import TensoRFTrainer

    root = str(tmp_path / "synth")
    make_synthetic_dataset(root, n_train=6, n_val=1, n_test=1, H=64, W=64, num_steps=256)
    train_ds = NeRFDataset(root, split="train", scale=0.8)
    val_ds = NeRFDataset(root, split="val", scale=0.8)

    render_cfg = RenderConfig(
        bound=1.0, min_near=0.05, dt_gamma=0.0, max_steps=64,
        max_samples_per_ray=16, grid_size=32, density_thresh=10.0,
        turbo=True, coarse_candidates=48, crossing_slots=16,
        compact_mean_samples=8,
    )
    train_cfg = TrainConfig(
        iters=200, lr=2e-2, num_rays=1024, workspace=str(tmp_path / "ws"),
        update_extra_interval=8,
    )
    model = TensoRFNetwork(
        resolution=(32, 32, 32), sigma_rank=(4, 4, 4), color_rank=(12, 12, 12),
        hidden_dim=64,
    )
    trainer = TensoRFTrainer(
        model, render_cfg, train_cfg,
        upsample_model_steps=[60],
        resolution0=32, resolution1=48,
        log_every=10**9, use_tensorboard=False,
    )
    trainer.ensure_initialized()
    before = trainer.evaluate(val_ds, max_frames=1)["psnr"]
    trainer.train_on_dataset(train_ds, valid_ds=None, max_epochs=20)  # 120 steps
    after = trainer.evaluate(val_ds, max_frames=1)["psnr"]
    print(f"tensoRF-turbo PSNR: {before:.2f} -> {after:.2f}")
    assert after > before + 4.0
    assert trainer.current_resolution == (48, 48, 48)

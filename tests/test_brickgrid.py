"""Brick-halo grid encoder tests: exact trilinear parity when halo
copies are consistent, gradcheck, OOB handling, and training quality
parity with the exact hash encoder on the e2e synthetic scene."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ngp_tpu.ops.brickgrid import (
    BrickGridConfig,
    brick_encode,
    dense_field_to_brick_table,
)


def test_matches_exact_trilinear_on_dense_level():
    cfg = BrickGridConfig(num_levels=1, level_dim=2, base_resolution=8, per_level_scale=1.0)
    res = cfg.level_resolution(0)
    rng = np.random.default_rng(0)
    # +1: stencils at the top edge read corner res (pos up to res-1+1)
    field = rng.normal(size=(res + 1, res + 1, res + 1, 2)).astype(np.float32)
    rows = dense_field_to_brick_table(field, cfg, 0)
    table = jnp.asarray(rows)

    x = rng.uniform(0.02, 0.98, size=(200, 3)).astype(np.float32)
    got = np.asarray(brick_encode(jnp.asarray(x), table, cfg))

    # manual trilinear of `field` at pos = x*scale + 0.5
    scale = cfg.level_scale(0)
    pos = x * scale + 0.5
    p0 = np.floor(pos).astype(int)
    f = pos - p0
    expect = np.zeros((200, 2), np.float32)
    for c in range(8):
        ox, oy, oz = c & 1, (c >> 1) & 1, (c >> 2) & 1
        w = (
            (f[:, 0] if ox else 1 - f[:, 0])
            * (f[:, 1] if oy else 1 - f[:, 1])
            * (f[:, 2] if oz else 1 - f[:, 2])
        )
        expect += w[:, None] * field[p0[:, 0] + ox, p0[:, 1] + oy, p0[:, 2] + oz]
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


def test_one_gather_shapes_and_oob():
    cfg = BrickGridConfig(num_levels=4, level_dim=4, base_resolution=16, log2_hashmap_size=10)
    table = cfg.init(jax.random.PRNGKey(0)) + 1.0
    x = jnp.asarray([[0.5, 0.5, 0.5], [1.2, 0.5, 0.5]])
    out = brick_encode(x, table, cfg)
    assert out.shape == (2, 16)
    assert np.any(np.asarray(out[0]) != 0)
    assert np.all(np.asarray(out[1]) == 0)  # OOB → zeros


def test_gradcheck():
    with jax.enable_x64(True):
        cfg = BrickGridConfig(num_levels=3, level_dim=2, base_resolution=4,
                              per_level_scale=1.6, log2_hashmap_size=7)
        rng = np.random.default_rng(1)
        table = jnp.asarray(rng.normal(size=(cfg.num_rows, cfg.row_width)))
        x = jnp.asarray(rng.uniform(0.1, 0.9, size=(16, 3)))
        cot = jnp.asarray(rng.normal(size=(16, cfg.output_dim)))

        def f(t):
            return jnp.vdot(brick_encode(x, t, cfg), cot)

        g = jax.grad(f)(table)
        for seed in range(3):
            v = jnp.asarray(np.random.default_rng(seed).normal(size=table.shape))
            eps = 1e-6
            fd = (f(table + eps * v) - f(table - eps * v)) / (2 * eps)
            np.testing.assert_allclose(float(jnp.vdot(g, v)), float(fd), rtol=1e-5)


def test_training_quality_close_to_hash(tmp_path):
    """The brick encoder's halo-copy approximation must not cost much
    PSNR vs the exact hash encoder on the synthetic e2e task."""
    from ngp_tpu.config import NetworkConfig, RenderConfig, TrainConfig
    from ngp_tpu.data.nerf_dataset import NeRFDataset
    from ngp_tpu.data.synthetic import make_synthetic_dataset
    from ngp_tpu.models.nerf import NeRFNetwork
    from ngp_tpu.training.nerf_grid import GridNeRFTrainer

    root = str(tmp_path / "synth")
    make_synthetic_dataset(root, n_train=6, n_val=1, n_test=1, H=64, W=64, num_steps=256)
    train_ds = NeRFDataset(root, split="train", scale=0.8)
    val_ds = NeRFDataset(root, split="val", scale=0.8)
    render_cfg = RenderConfig(
        bound=1.0, min_near=0.05, dt_gamma=0.0, max_steps=128,
        max_samples_per_ray=64, grid_size=32, density_thresh=10.0,
    )
    results = {}
    for enc in ("hashgrid", "brickgrid"):
        train_cfg = TrainConfig(
            iters=300, lr=1e-2, num_rays=1024,
            workspace=str(tmp_path / f"ws_{enc}"), update_extra_interval=8,
        )
        net_cfg = NetworkConfig(
            encoding=enc, num_levels=8, level_dim=2, log2_hashmap_size=13,
            use_bf16=False,
        )
        model = NeRFNetwork(cfg=net_cfg, render=render_cfg)
        trainer = GridNeRFTrainer(
            model, render_cfg, train_cfg, log_every=10**9, use_tensorboard=False
        )
        trainer.train_on_dataset(train_ds, valid_ds=None, max_epochs=25)
        results[enc] = trainer.evaluate(val_ds, max_frames=1)["psnr"]
    print("PSNR:", results)
    assert results["brickgrid"] > results["hashgrid"] - 2.0, results

"""Wiring tests for the optional regularisers and color-space handling:
tv_weight (gridencoder grad_total_variation equivalent),
distortion_weight (loss.py EffDistLoss), and --color_space linear
(nerf/utils.py:691-713) must actually change training/exports."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ngp_tpu.config import NetworkConfig, RenderConfig, TrainConfig
from ngp_tpu.data.nerf_dataset import NeRFDataset
from ngp_tpu.data.synthetic import make_synthetic_dataset
from ngp_tpu.models.nerf import NeRFNetwork
from ngp_tpu.training.nerf import NeRFTrainer


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth"))
    make_synthetic_dataset(root, n_train=4, n_val=1, n_test=1, H=32, W=32, num_steps=128)
    return root


def _trainer(tmp_path, **train_kw):
    render_cfg = RenderConfig(bound=1.0, min_near=0.05, num_steps=32, upsample_steps=0)
    # log2_hashmap_size=19 keeps level 0 dense (17^3 < 2^19) so the TV
    # regulariser has a level to act on
    net_cfg = NetworkConfig(num_levels=4, level_dim=2, log2_hashmap_size=19, use_bf16=False)
    train_cfg = TrainConfig(
        iters=10, lr=1e-2, num_rays=128, workspace=str(tmp_path), seed=0, **train_kw
    )
    model = NeRFNetwork(cfg=net_cfg, render=render_cfg)
    return NeRFTrainer(model, render_cfg, train_cfg, log_every=10**9, use_tensorboard=False)


def _one_step_loss(trainer, ds):
    trainer.ensure_initialized()
    batch = {
        "images": jnp.asarray(ds.images),
        "poses": jnp.asarray(ds.poses),
        "intrinsics": jnp.asarray(ds.intrinsics),
        "idx": jnp.int32(0),
    }
    rng = jax.random.PRNGKey(0)
    _, _, metrics = trainer.train_step(trainer.state, trainer.aux, batch, rng)
    return float(metrics["loss"])


def test_tv_loss_positive_and_changes_objective(tmp_path):
    t1 = _trainer(tmp_path / "b", tv_weight=1.0)
    t1.ensure_initialized()
    tv = float(t1.model.apply(t1.state.params, method=NeRFNetwork.tv_loss))
    assert tv > 0.0
    assert float(t1._loss_extra(t1.state.params)) == pytest.approx(tv, rel=1e-5)
    # the regulariser produces gradients on the grid table
    g = jax.grad(lambda p: t1._loss_extra(p))(t1.state.params)
    gnorm = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.sum(jnp.abs(x))), g, 0.0
    )
    assert gnorm > 0.0
    # weight 0 => term disabled entirely
    t0 = _trainer(tmp_path / "a")
    t0.ensure_initialized()
    assert t0._loss_extra(t0.state.params) == 0.0
    # constant table => zero TV
    flat = jax.tree_util.tree_map(jnp.ones_like, t1.state.params)
    assert float(t1.model.apply(flat, method=NeRFNetwork.tv_loss)) == 0.0


def test_distortion_loss_changes_objective(synth_root, tmp_path):
    ds = NeRFDataset(synth_root, split="train", scale=0.8)
    l0 = _one_step_loss(_trainer(tmp_path / "a"), ds)
    l1 = _one_step_loss(_trainer(tmp_path / "b", distortion_weight=0.1), ds)
    assert l1 > l0  # distortion of a fresh model is strictly positive


def test_color_space_linear_dataset_and_export(synth_root, tmp_path):
    from ngp_tpu.utils.color import linear_to_srgb_np, srgb_to_linear_np

    # round trip
    x = np.linspace(0, 1, 64)
    np.testing.assert_allclose(linear_to_srgb_np(srgb_to_linear_np(x)), x, atol=1e-6)

    ds_s = NeRFDataset(synth_root, split="train", scale=0.8)
    ds_l = NeRFDataset(synth_root, split="train", scale=0.8, color_space="linear")
    np.testing.assert_allclose(
        ds_l.images[..., :3], srgb_to_linear_np(ds_s.images[..., :3]), atol=1e-6
    )
    # alpha channel untouched
    np.testing.assert_array_equal(ds_l.images[..., 3], ds_s.images[..., 3])

    t = _trainer(tmp_path, color_space="linear")
    img = np.random.default_rng(0).random((4, 4, 3)).astype(np.float32)
    np.testing.assert_allclose(t._export_color(img), linear_to_srgb_np(img), atol=1e-6)
    t_s = _trainer(tmp_path / "s")
    np.testing.assert_array_equal(t_s._export_color(img), img)

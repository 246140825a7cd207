"""Random-pose guidance (CLIP-mode) training path test: loaders emit
guidance batches for virtual indices and the guidance step updates
params with the stand-in jnp image loss."""

import numpy as np
import jax

from ngp_tpu.config import NetworkConfig, RenderConfig, TrainConfig
from ngp_tpu.data.nerf_dataset import NeRFDataset
from ngp_tpu.data.synthetic import make_synthetic_dataset
from ngp_tpu.models.nerf import NeRFNetwork
from ngp_tpu.training.clip_guidance import GradientImageLoss
from ngp_tpu.training.nerf_grid import GridNeRFTrainer


def test_guidance_batches_and_step(tmp_path):
    root = str(tmp_path / "synth")
    make_synthetic_dataset(root, n_train=4, n_val=1, n_test=1, H=40, W=40, num_steps=96)
    ds = NeRFDataset(root, split="train", scale=0.8)

    render_cfg = RenderConfig(
        bound=1.0, min_near=0.05, dt_gamma=0.0, max_steps=64,
        max_samples_per_ray=32, grid_size=16, density_thresh=10.0,
    )
    net_cfg = NetworkConfig(num_levels=4, log2_hashmap_size=12, use_bf16=False)
    # rand_pose=2: one virtual (guidance) index per 2 real frames
    train_cfg = TrainConfig(
        iters=100, num_rays=256, workspace=str(tmp_path / "ws"), rand_pose=2,
    )
    model = NeRFNetwork(cfg=net_cfg, render=render_cfg)
    trainer = GridNeRFTrainer(
        model, render_cfg, train_cfg, log_every=10**9, use_tensorboard=False
    )
    trainer.guidance_loss = GradientImageLoss("a colorful object")
    trainer.ensure_initialized()

    batches = list(trainer.make_loader(ds)())
    kinds = ["guidance" in b for b in batches]
    assert sum(kinds) == 2  # 4 frames + 4//2 virtual
    assert len(batches) == 6

    params_before = jax.device_get(
        jax.tree_util.tree_leaves(trainer.state.params)[0]
    ).copy()
    trainer.train_on_dataset(ds, valid_ds=None, max_epochs=1)
    params_after = jax.device_get(jax.tree_util.tree_leaves(trainer.state.params)[0])
    assert trainer.global_step == 6  # all batches consumed (4 mse + 2 guidance)
    assert np.abs(params_before - params_after).max() > 0

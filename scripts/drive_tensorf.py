#!/usr/bin/env python
"""Drive TensoRF end-to-end on the real TPU: steady-state steps/s at
the final factor resolution + eval PSNR, for the v1 masked marcher vs
the turbo march (model-agnostic flagship path).

Reference baseline: 51 train it/s x 4096 rays ~= 0.21 M rays/s on V100
(readme.md:218).

Env knobs: NGP_MARCH=turbo|v1, NGP_STEPS, NGP_RAYS, NGP_RES1.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np


def main():
    from ngp_tpu.config import RenderConfig, TrainConfig
    from ngp_tpu.data.nerf_dataset import NeRFDataset
    from ngp_tpu.data.synthetic import make_synthetic_dataset
    from ngp_tpu.models.tensorf import TensoRFNetwork
    from ngp_tpu.training.tensorf import TensoRFTrainer

    march = os.environ.get("NGP_MARCH", "turbo")
    n_steps = int(os.environ.get("NGP_STEPS", "1500"))
    n_rays = int(os.environ.get("NGP_RAYS", "4096"))
    res1 = int(os.environ.get("NGP_RES1", "300"))
    H = 400

    cache = f"/root/.ngp_drive_default_{H}_16"
    make_synthetic_dataset(cache, n_train=16, n_val=1, n_test=1, H=H, W=H)
    train_ds = NeRFDataset(cache, split="train", scale=0.8)
    val_ds = NeRFDataset(cache, split="val", scale=0.8)

    turbo = march == "turbo"
    render_cfg = RenderConfig(
        bound=1.0, min_near=0.05, dt_gamma=0.0,
        max_steps=256 if turbo else 1024,
        max_samples_per_ray=32 if turbo else 256,
        grid_size=128, density_thresh=10.0,
        turbo=turbo, coarse_candidates=96, crossing_slots=16,
        compact_mean_samples=8,
    )
    train_cfg = TrainConfig(
        iters=30000, lr=2e-2, num_rays=n_rays, workspace="/tmp/tsf_ws",
        update_extra_interval=16,
    )
    model = TensoRFNetwork(resolution=(128, 128, 128))
    trainer = TensoRFTrainer(
        model, render_cfg, train_cfg, lr_net=1e-3,
        upsample_model_steps=[500],  # jump straight to the final res
        resolution0=128, resolution1=res1,
        log_every=10**9, use_tensorboard=False,
    )
    trainer.ensure_initialized()
    trainer.mark_untrained(
        train_ds.poses, train_ds.intrinsics, train_ds.H, train_ds.W
    )

    epoch_iter = trainer.make_loader(train_ds)
    t_start = time.perf_counter()
    done = 0
    window_t0 = None
    while done < n_steps:
        for batch in epoch_iter():
            metrics = trainer.step(batch)
            done += 1
            if done % 250 == 0:
                jax.block_until_ready(metrics)
                print(
                    f"step {done}: loss {float(metrics['loss']):.5f} "
                    f"res {trainer.current_resolution} "
                    f"({time.perf_counter()-t_start:.1f}s)", flush=True,
                )
            if done == n_steps - 256:
                jax.block_until_ready(metrics)
                window_t0 = time.perf_counter()
            if done >= n_steps:
                break
    jax.block_until_ready(trainer.state.params)
    dt = time.perf_counter() - window_t0
    sps = 256 / dt
    print(
        f"{march}: steady-state {sps:.1f} steps/s = "
        f"{sps*n_rays:,.0f} rays/s (vs TensoRF-V100 baseline "
        f"{sps*n_rays/208896:.2f}) at res {trainer.current_resolution}",
        flush=True,
    )
    res = trainer.evaluate(val_ds)
    print("eval:", res, flush=True)


if __name__ == "__main__":
    main()

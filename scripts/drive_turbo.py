#!/usr/bin/env python
"""Drive the turbo preset end-to-end on the real TPU: train the CP-grid
NeRF on the synthetic scene, report loss curve, step time, eval PSNR."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from ngp_tpu.config import NetworkConfig, RenderConfig, TrainConfig
    from ngp_tpu.data.nerf_dataset import NeRFDataset
    from ngp_tpu.data.synthetic import make_synthetic_dataset
    from ngp_tpu.models.nerf import NeRFNetwork
    from ngp_tpu.training.nerf_grid import GridNeRFTrainer

    n_steps = int(os.environ.get("NGP_STEPS", "1000"))
    cache = os.environ.get("NGP_BENCH_DATA", "/root/.ngp_bench_data")
    make_synthetic_dataset(cache, n_train=16, n_val=1, n_test=1, H=400, W=400)
    train_ds = NeRFDataset(cache, split="train", scale=0.8)
    val_ds = NeRFDataset(cache, split="val", scale=0.8)

    render_cfg = RenderConfig(
        bound=1.0, min_near=0.05, dt_gamma=0.0, max_steps=256,
        max_samples_per_ray=32, grid_size=128, density_thresh=10.0,
        turbo=True, coarse_candidates=96, crossing_slots=16,
        compact_mean_samples=8,
    )
    net_cfg = NetworkConfig(
        encoding="cpgrid", use_bf16=True,
        cp_resolutions=(256, 512, 1024, 2048), cp_rank=64, cp_freq_degree=5,
    )
    train_cfg = TrainConfig(
        iters=30000, lr=1e-2, num_rays=16384, workspace="/tmp/turbo_ws",
        update_extra_interval=16,
    )
    model = NeRFNetwork(cfg=net_cfg, render=render_cfg)
    trainer = GridNeRFTrainer(
        model, render_cfg, train_cfg, log_every=10**9, use_tensorboard=False
    )
    trainer.ensure_initialized()
    trainer.mark_untrained(train_ds.poses, train_ds.intrinsics, train_ds.H, train_ds.W)

    epoch_iter = trainer.make_loader(train_ds)
    t_start = time.perf_counter()
    done = 0
    losses = []
    window_t0 = None
    while done < n_steps:
        for batch in epoch_iter():
            metrics = trainer.step(batch)
            done += 1
            if done % 100 == 0:
                jax.block_until_ready(metrics)
                losses.append(float(metrics["loss"]))
                print(f"step {done}: loss {losses[-1]:.5f}  "
                      f"({(time.perf_counter()-t_start):.1f}s elapsed)")
            if done == n_steps - 256:
                jax.block_until_ready(metrics)
                window_t0 = time.perf_counter()
            if done >= n_steps:
                break
    jax.block_until_ready(trainer.state.params)
    if window_t0:
        dt = time.perf_counter() - window_t0
        sps = 256 / dt
        print(f"steady-state: {sps:.1f} steps/s = {sps*train_cfg.num_rays:,.0f} rays/s "
              f"(vs_baseline {sps*train_cfg.num_rays/397312:.2f})")
    occ_frac = float(jnp.mean(trainer.aux["occ"].occ_grid.astype(jnp.float32)))
    print(f"occ fraction: {occ_frac:.3f}")

    res = trainer.evaluate(val_ds, with_ssim=False)
    print("eval:", res)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Drive the turbo preset end-to-end on the real TPU: train the CP-grid
NeRF on the synthetic scene, report loss curve, step time, eval PSNR.

Env knobs (all optional):
  NGP_STEPS=1000        train steps
  NGP_PRESET=turbo      turbo | turbo-hq
  NGP_DT_GAMMA=0        adaptive-step gamma (reference default 1/128)
  NGP_BOUND=1           scene bound (cascades = 1+ceil(log2(bound)))
  NGP_VARIANT=default   synthetic variant (default | hard)
  NGP_H=400             image resolution
  NGP_RAYS=16384        rays per step
  NGP_VIEWS=16          train views
  NGP_EVAL_SSIM=0       also meter SSIM at eval
"""
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
    preset = os.environ.get("NGP_PRESET", "turbo")
    dt_gamma = float(os.environ.get("NGP_DT_GAMMA", "0"))
    bound = float(os.environ.get("NGP_BOUND", "1"))
    variant = os.environ.get("NGP_VARIANT", "default")
    H = int(os.environ.get("NGP_H", "400"))
    n_rays = int(os.environ.get("NGP_RAYS", "16384"))
    n_views = int(os.environ.get("NGP_VIEWS", "16"))

    cache = os.environ.get(
        "NGP_BENCH_DATA", f"/root/.ngp_drive_{variant}_{H}_{n_views}"
    )
    make_synthetic_dataset(
        cache, n_train=n_views, n_val=1, n_test=1, H=H, W=H, variant=variant
    )
    train_ds = NeRFDataset(cache, split="train", scale=0.8)
    val_ds = NeRFDataset(cache, split="val", scale=0.8)

    render_cfg = RenderConfig(
        bound=bound, min_near=0.05, dt_gamma=dt_gamma, max_steps=256,
        max_samples_per_ray=32, grid_size=128, density_thresh=10.0,
        turbo=True, coarse_candidates=96, crossing_slots=16,
        compact_mean_samples=int(os.environ.get("NGP_MEAN", "6")),
    )
    if preset == "turbo-hq":
        net_cfg = NetworkConfig(
            encoding="cpgrid", use_bf16=True,
            cp_resolutions=(128, 256, 512, 1024, 2048), cp_rank=128,
            cp_freq_degree=6,
        )
    else:
        net_cfg = NetworkConfig(
            encoding="cpgrid", use_bf16=True,
            cp_resolutions=(256, 512, 1024, 2048), cp_rank=64, cp_freq_degree=5,
        )
    rank_env = os.environ.get("NGP_RANK")
    if rank_env:  # capacity probes (e.g. rank-96 turbo-hq)
        import dataclasses

        net_cfg = dataclasses.replace(net_cfg, cp_rank=int(rank_env))
    train_cfg = TrainConfig(
        iters=30000, lr=1e-2, num_rays=n_rays, workspace="/tmp/turbo_ws",
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
                ovf = float(metrics.get("turbo_overflow", 0.0))
                print(f"step {done}: loss {losses[-1]:.5f} overflow {ovf:.3f} "
                      f"({(time.perf_counter()-t_start):.1f}s elapsed)",
                      flush=True)
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

    res = trainer.evaluate(
        val_ds, with_ssim=os.environ.get("NGP_EVAL_SSIM", "0") == "1"
    )
    print("eval:", res)


if __name__ == "__main__":
    main()

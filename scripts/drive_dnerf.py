#!/usr/bin/env python
"""Drive D-NeRF end-to-end on the real TPU: steady-state train steps/s
on the shared turbo stack (time-sliced packed payloads), eval
PSNR/SSIM over the dynamic validation split, and per-frame render
time.

The reference publishes no D-NeRF performance numbers (its readme
covers only static NeRF and TensoRF); this records the measured row
the README table cites. Protocol mirrors drive_tensorf.py: dynamic
procedural scene (first sphere oscillates in x), 400x400, deform
model, -O defaults (main_dnerf.py).

Env: NGP_STEPS (default 4000), NGP_RAYS (4096), NGP_H (400),
NGP_MODEL=deform|basis.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np


def main():
    from ngp_tpu.config import NetworkConfig, RenderConfig, TrainConfig
    from ngp_tpu.data.nerf_dataset import NeRFDataset
    from ngp_tpu.data.synthetic import make_synthetic_dataset
    from ngp_tpu.models.dnerf import DNeRFBasisNetwork, DNeRFNetwork
    from ngp_tpu.training.dnerf import DNeRFTrainer

    n_steps = int(os.environ.get("NGP_STEPS", "4000"))
    n_rays = int(os.environ.get("NGP_RAYS", "4096"))
    H = int(os.environ.get("NGP_H", "400"))
    which = os.environ.get("NGP_MODEL", "deform")

    cache = f"/root/.ngp_dnerf_{H}"
    make_synthetic_dataset(cache, n_train=24, n_val=4, n_test=1, H=H, W=H,
                           dynamic=True)
    train_ds = NeRFDataset(cache, split="train", scale=0.8)
    val_ds = NeRFDataset(cache, split="val", scale=0.8)

    render_cfg = RenderConfig(
        bound=1.0, min_near=0.05, dt_gamma=0.0, max_steps=256,
        max_samples_per_ray=32, grid_size=128, density_thresh=10.0,
        time_size=64, turbo=True, coarse_candidates=96, crossing_slots=16,
        compact_mean_samples=8,
    )
    net_cfg = NetworkConfig(use_bf16=True)
    train_cfg = TrainConfig(
        iters=30000, lr=1e-2, num_rays=n_rays, workspace="/tmp/dnerf_drive_ws",
        update_extra_interval=16,
    )
    cls = DNeRFBasisNetwork if which == "basis" else DNeRFNetwork
    model = cls(cfg=net_cfg, render=render_cfg)
    trainer = DNeRFTrainer(
        model, render_cfg, train_cfg, name="dnerf", log_every=10**9,
        use_tensorboard=False,
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
            if done % 500 == 0:
                jax.block_until_ready(metrics)
                print(f"step {done}: loss {float(metrics['loss']):.5f} "
                      f"({time.perf_counter()-t_start:.1f}s)", flush=True)
            if done == n_steps - 256:
                jax.block_until_ready(metrics)
                window_t0 = time.perf_counter()
            if done >= n_steps:
                break
    jax.block_until_ready(trainer.state.params)
    sps = 256 / (time.perf_counter() - window_t0)
    print(
        f"dnerf-{which}: steady-state {sps:.1f} steps/s = "
        f"{sps*n_rays:,.0f} rays/s "
        f"(static-NeRF V100 anchor 97 it/s x 4096: {sps*n_rays/397312:.2f})",
        flush=True,
    )
    res = trainer.evaluate(val_ds, with_ssim=True)
    print(f"eval[dnerf-{which}]:", res, flush=True)

    # frame render time at the frame's own scene time
    trainer.eval_mean_samples = 6
    tval = float(val_ds.times[0]) if val_ds.times is not None else 0.0
    walls, devs = [], []
    kw = dict(want_depth=False, times=np.array([tval], np.float32))
    trainer.render_frames(
        np.asarray(val_ds.poses[0], np.float32)[None], val_ds.intrinsics,
        val_ds.H, val_ds.W, **kw,
    )  # compile
    for i in range(5):
        p = np.asarray(val_ds.poses[i % len(val_ds)], np.float32)[None]
        ti = (
            np.array([float(val_ds.times[i % len(val_ds)])], np.float32)
            if val_ds.times is not None else np.zeros(1, np.float32)
        )
        t0 = time.perf_counter()
        fin = trainer.render_frames(
            p, val_ds.intrinsics, val_ds.H, val_ds.W, want_depth=False,
            times=ti, async_result=True,
        )
        if fin.device_arrays[0] is not None:
            jax.block_until_ready(fin.device_arrays[0])
        devs.append(time.perf_counter() - t0)
        fin()
        walls.append(time.perf_counter() - t0)
    print(
        f"test[dnerf-{which}] {val_ds.W}x{val_ds.H}: device "
        f"{float(np.median(devs))*1000:.0f} ms/frame, wall "
        f"{float(np.median(walls))*1000:.0f} ms", flush=True,
    )


if __name__ == "__main__":
    main()

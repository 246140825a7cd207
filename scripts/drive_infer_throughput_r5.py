#!/usr/bin/env python
"""Round-5 inference THROUGHPUT measurement.

The round-5 device profile (xplane, /device:TPU:0 "XLA Modules") puts
the true per-frame device execution at ~137 ms (render 118.5 +
prepass 16.4 + slice 1.9) while the per-frame synced wall reads
~266 ms — half the measured "device" time was tunnel dispatch/sync
latency, which a local deployment does not pay and which PIPELINING
across frames should hide. The reference's 7.8 it/s (readme.md:213) is
itself a throughput number over the test loop, so the apples-to-apples
metric is frames/s with the next frame's dispatch overlapping the
current frame's sync.

Modes timed (after 1000 training steps, turbo-hq flagship, 800x800):
  sync     — render_frames + block per frame (the old metric)
  pipeline — dispatch all K frames (async_result), block at the end
Each at ems6 and ems6+tp4 (the quality-positive proxy early-out).

Env: NGP_H, NGP_STEPS, NGP_CHUNK, NGP_FRAMES (default 8).
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
    from ngp_tpu.models.nerf import NeRFNetwork
    from ngp_tpu.training.nerf_grid import GridNeRFTrainer

    H = int(os.environ.get("NGP_H", "800"))
    n_steps = int(os.environ.get("NGP_STEPS", "1000"))
    K = int(os.environ.get("NGP_FRAMES", "8"))
    cache = f"/root/.ngp_infer_{H}"
    make_synthetic_dataset(cache, n_train=16, n_val=8, n_test=1, H=H, W=H)
    train_ds = NeRFDataset(cache, split="train", scale=0.8)
    val_ds = NeRFDataset(cache, split="val", scale=0.8)

    render_cfg = RenderConfig(
        bound=1.0, min_near=0.05, dt_gamma=0.0, max_steps=256,
        max_samples_per_ray=32, grid_size=128, density_thresh=10.0,
        turbo=True, coarse_candidates=96, crossing_slots=16,
        compact_mean_samples=6,
    )
    net_cfg = NetworkConfig(
        encoding="cpgrid", use_bf16=True,
        cp_resolutions=(128, 256, 512, 1024, 2048), cp_rank=128,
        cp_freq_degree=6,
    )
    train_cfg = TrainConfig(
        iters=30000, lr=1e-2, num_rays=16384, workspace="/tmp/infer_ws",
        update_extra_interval=16,
    )
    model = NeRFNetwork(cfg=net_cfg, render=render_cfg)
    trainer = GridNeRFTrainer(
        model, render_cfg, train_cfg, log_every=10**9, use_tensorboard=False
    )
    trainer.ensure_initialized()
    trainer.mark_untrained(train_ds.poses, train_ds.intrinsics, train_ds.H,
                           train_ds.W)
    epoch_iter = trainer.make_loader(train_ds)
    done = 0
    while done < n_steps:
        for batch in epoch_iter():
            trainer.step(batch)
            done += 1
            if done >= n_steps:
                break
    jax.block_until_ready(trainer.state.params)
    print(f"trained {n_steps}", flush=True)

    chunk = int(os.environ.get("NGP_CHUNK", "4096"))
    intr = val_ds.intrinsics
    poses = [np.asarray(val_ds.poses[i % 8], np.float32) for i in range(K + 2)]
    gt = np.asarray(val_ds.images[0], np.float32)
    if gt.shape[-1] == 4:
        gt = gt[..., :3] * gt[..., 3:] + 1.0 * (1 - gt[..., 3:])

    def dispatch(pose):
        return trainer.render_frames(
            pose[None], intr, H, H, chunk=chunk, want_depth=False,
            async_result=True,
        )

    for name, tp in (("ems6", None), ("ems6+tp4", 1e-4)):
        trainer.eval_mean_samples = 6
        trainer.eval_t_proxy = tp
        trainer._jit_render_chunks = {}
        fin = dispatch(poses[0])  # compile
        jax.block_until_ready(fin.device_arrays[0])
        img, _ = (lambda r: (r[0][0], r[1][0]))(fin())
        fin = dispatch(poses[1])
        jax.block_until_ready(fin.device_arrays[0])
        mse = float(np.mean((np.asarray(img, np.float64) / 1.0 - gt) ** 2))
        print(f"{name}: PSNR {10*np.log10(1/max(mse,1e-12)):.2f}", flush=True)

        # (a) per-frame sync (the old metric)
        devs = []
        for i in range(K):
            t0 = time.perf_counter()
            fin = dispatch(poses[i])
            jax.block_until_ready(fin.device_arrays[0])
            devs.append(time.perf_counter() - t0)
        print(f"{name} sync: median {np.median(devs)*1000:.0f} ms/frame",
              flush=True)

        # (b) pipelined: dispatch all, block at the end
        for rep in range(2):
            t0 = time.perf_counter()
            fins = [dispatch(poses[i]) for i in range(K)]
            for fin in fins:
                jax.block_until_ready(fin.device_arrays[0])
            dt = time.perf_counter() - t0
            print(f"{name} pipeline x{K} (rep {rep}): total {dt*1000:.0f} ms "
                  f"= {dt/K*1000:.0f} ms/frame ({K/dt:.2f} fps)", flush=True)


if __name__ == "__main__":
    main()

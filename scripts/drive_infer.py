#!/usr/bin/env python
"""Inference throughput sweep on the real TPU.

Trains the turbo flagship briefly (sparse converged grid), then
measures render_frame wall time + PSNR-vs-GT at 800x800 across the
eval dials (chunk size, eval_mean_samples, eval_max_samples,
eval_probe_stride), plus the batched multi-frame eval speedup.

Env: NGP_STEPS (train steps, default 1000), NGP_H (default 800),
NGP_CONFIGS ("name:chunk:ems:ems_max:stride;..." to override the sweep).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np


def psnr(a, b):
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return 10.0 * np.log10(1.0 / max(mse, 1e-12))


def main():
    from ngp_tpu.config import NetworkConfig, RenderConfig, TrainConfig
    from ngp_tpu.data.nerf_dataset import NeRFDataset
    from ngp_tpu.data.synthetic import make_synthetic_dataset
    from ngp_tpu.models.nerf import NeRFNetwork
    from ngp_tpu.training.nerf_grid import GridNeRFTrainer

    n_steps = int(os.environ.get("NGP_STEPS", "1000"))
    H = int(os.environ.get("NGP_H", "800"))
    cache = f"/root/.ngp_infer_{H}"
    make_synthetic_dataset(cache, n_train=16, n_val=8, n_test=1, H=H, W=H)
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
        iters=30000, lr=1e-2, num_rays=16384, workspace="/tmp/infer_ws",
        update_extra_interval=16,
    )
    model = NeRFNetwork(cfg=net_cfg, render=render_cfg)
    trainer = GridNeRFTrainer(
        model, render_cfg, train_cfg, log_every=10**9, use_tensorboard=False
    )
    trainer.ensure_initialized()
    trainer.mark_untrained(train_ds.poses, train_ds.intrinsics, train_ds.H, train_ds.W)

    epoch_iter = trainer.make_loader(train_ds)
    done = 0
    t0 = time.perf_counter()
    while done < n_steps:
        for batch in epoch_iter():
            m = trainer.step(batch)
            done += 1
            if done >= n_steps:
                break
    jax.block_until_ready(trainer.state.params)
    print(f"trained {n_steps} steps in {time.perf_counter()-t0:.1f}s", flush=True)

    gt = val_ds.images[0]
    if gt.shape[-1] == 4:
        gt = gt[..., :3] * gt[..., 3:] + 1.0 * (1 - gt[..., 3:])
    pose0 = val_ds.poses[0]
    intr = val_ds.intrinsics

    default = [
        # name, chunk, eval_mean_samples, eval_max_samples, stride
        ("base-16k", 16384, 8, None, 1),
        ("chunk64k", 65536, 8, None, 1),
        ("chunk64k-s2", 65536, 8, None, 2),
        ("chunk64k-ems4", 65536, 4, 16, 1),
        ("chunk64k-ems4-s2", 65536, 4, 16, 2),
    ]
    spec = os.environ.get("NGP_CONFIGS", "")
    if spec:
        default = []
        for part in spec.split(";"):
            nm, ch, ems, mx, st = part.split(":")
            default.append((nm, int(ch), int(ems) if ems != "-" else None,
                            int(mx) if mx != "-" else None, int(st)))

    for name, chunk, ems, mx, stride in default:
        trainer.eval_mean_samples = ems
        trainer.eval_max_samples = mx
        trainer.eval_probe_stride = stride
        trainer._jit_render_chunks = {}
        img, _ = trainer.render_frame(pose0, intr, H, H, chunk=chunk)  # compile
        ts = []
        for i in range(6):
            p = val_ds.poses[(i % (len(val_ds) - 1)) + 1]
            t1 = time.perf_counter()
            img_i, _ = trainer.render_frame(p, intr, H, H, chunk=chunk)
            ts.append(time.perf_counter() - t1)
        sec = float(np.median(ts))
        print(f"{name}: {sec*1000:.0f} ms/frame = {1/sec:.2f} fps, "
              f"PSNR {psnr(img, gt):.2f}", flush=True)

    # batched multi-frame eval: 8 frames in one dispatch vs 8 dispatches
    trainer.eval_mean_samples = 8
    trainer.eval_max_samples = None
    trainer.eval_probe_stride = 1
    trainer._jit_render_chunks = {}
    poses8 = np.asarray(val_ds.poses[:8], np.float32)
    imgs, _ = trainer.render_frames(poses8, intr, H, H)  # compile
    t1 = time.perf_counter()
    imgs, _ = trainer.render_frames(poses8, intr, H, H)
    batched = time.perf_counter() - t1
    for i in range(2):  # compile the single-frame path
        trainer.render_frame(poses8[0], intr, H, H)
    t1 = time.perf_counter()
    for i in range(8):
        trainer.render_frame(poses8[i], intr, H, H)
    looped = time.perf_counter() - t1
    print(f"batched 8-frame eval: {batched:.2f}s vs looped {looped:.2f}s "
          f"({looped/batched:.2f}x)", flush=True)


if __name__ == "__main__":
    main()

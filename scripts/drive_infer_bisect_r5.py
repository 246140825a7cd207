#!/usr/bin/env python
"""Round-5 stage bisect of the DEFAULT eval frame path (prepass +
device-side chunk lists + compacted turbo render).

Round-4's microbench_evalpath bisect (march 46% / density 39% / color
13%) predates the prepass era and no longer matches the dial sweep:
halving the probe lattice (eval_probe_stride=2) measured ~0 ms at
800x800. This drive splits the CURRENT per-frame device time into
  (a) the prepass dispatch alone (its own jit),
  (b) the full frame, and
  (c) the mean-sample slope: frame time at ems in {2, 3, 6, 12}
so the network-vs-fixed split is measured, not inherited.

Methodology per CLAUDE.md: varied poses per call, block_until_ready,
medians over interleaved rounds.
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

    H = int(os.environ.get("NGP_H", "800"))
    n_steps = int(os.environ.get("NGP_STEPS", "1000"))
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
    poses = [np.asarray(val_ds.poses[i], np.float32) for i in range(8)]

    # ---- (a) prepass alone -------------------------------------------------
    # render one frame first so the tight box + sticky span settle
    trainer.eval_mean_samples = 6
    trainer.render_frames(poses[0][None], intr, H, H, chunk=chunk,
                          want_depth=False)
    aabb_eff = np.asarray(trainer.render_cfg.aabb, np.float32)
    box = trainer._fetch_eval_tight_box()
    if box is not None:
        lo = np.maximum(aabb_eff[:3], box[:3])
        hi = np.minimum(aabb_eff[3:], box[3:])
        aabb_eff = np.concatenate([lo, hi])
    ts = []
    for i in range(10):
        t0 = time.perf_counter()
        pre = trainer._run_eval_prepass(poses[1 + i % 7][None], intr, H, H,
                                        aabb_eff)
        jax.block_until_ready(pre["sorted_inds"])
        ts.append(time.perf_counter() - t0)
    print(f"prepass alone: median {np.median(ts[2:])*1000:.0f} ms "
          f"(count {pre['count']})", flush=True)

    # ---- (b)/(c) full frame at several mean-sample budgets -----------------
    def render_once(pose):
        t0 = time.perf_counter()
        fin = trainer.render_frames(
            pose[None], intr, H, H, chunk=chunk, want_depth=False,
            async_result=True,
        )
        if fin.device_arrays[0] is not None:
            jax.block_until_ready(fin.device_arrays[0])
        return time.perf_counter() - t0

    for ems in (2, 3, 6, 12):
        trainer.eval_mean_samples = ems
        trainer._jit_render_chunks = {}
        render_once(poses[0])
        render_once(poses[1])
        devs = [render_once(poses[1 + i % 7]) for i in range(6)]
        print(f"ems{ems}: device {np.median(devs)*1000:.0f} ms/frame "
              f"(min {min(devs)*1000:.0f})", flush=True)


if __name__ == "__main__":
    main()

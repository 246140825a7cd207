#!/usr/bin/env python
"""What is the eval prepass's 74 ms made of? (round-5 bisect follow-up)

Times trainer._run_eval_prepass at 800x800 under varied dials:
  - pixel stride s in {1, 2, 4}        (ray count  /s^2)
  - prepass chunk 65536 vs 262144      (lax.map iterations /4)
and a raw jitted ray_prepass (no sort / reconstruction) at the same
shapes, to split ray-proportional probe work from fixed overhead.
Varied poses per call, block_until_ready, medians.
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
    n_steps = int(os.environ.get("NGP_STEPS", "500"))
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

    intr = val_ds.intrinsics
    poses = [np.asarray(val_ds.poses[i], np.float32) for i in range(8)]
    trainer.render_frames(poses[0][None], intr, H, H, chunk=4096,
                          want_depth=False)  # settle tight box + span
    aabb_eff = np.asarray(trainer.render_cfg.aabb, np.float32)
    box = trainer._fetch_eval_tight_box()
    if box is not None:
        aabb_eff = np.concatenate([
            np.maximum(aabb_eff[:3], box[:3]),
            np.minimum(aabb_eff[3:], box[3:]),
        ])
    print("span bucket:", trainer._eval_lattice_span, flush=True)

    def time_prepass(label, n=10):
        ts = []
        for i in range(n):
            t0 = time.perf_counter()
            pre = trainer._run_eval_prepass(
                poses[1 + i % 7][None], intr, H, H, aabb_eff
            )
            jax.block_until_ready(pre["sorted_inds"])
            ts.append(time.perf_counter() - t0)
        print(f"{label}: median {np.median(ts[2:])*1000:.1f} ms "
              f"(min {min(ts)*1000:.1f}, count {pre['count']})", flush=True)

    for s in (1, 2, 4):
        trainer.eval_prepass_stride = s
        trainer._jit_prepass = {}
        trainer._run_eval_prepass(poses[0][None], intr, H, H, aabb_eff)
        time_prepass(f"prepass s={s}")
    trainer.eval_prepass_stride = 1

    # raw ray_prepass (no device sort, no lax.map machinery): one jitted
    # call over the whole frame, rays generated on device
    import dataclasses

    from ngp_tpu.data.raysampler import rays_from_frame_indices
    from ngp_tpu.models.occupancy import ray_prepass

    span = trainer._eval_lattice_span
    pcfg = dataclasses.replace(render_cfg, lattice_span=span)
    n = H * H
    inds = jnp.asarray(np.arange(n, dtype=np.int32))
    fids = jnp.zeros((n,), jnp.int32)

    @jax.jit
    def raw_pre(aux, poses_d, intr_d, aabb):
        rays = rays_from_frame_indices(poses_d, intr_d, H, H, inds, fids)
        out = ray_prepass(rays["rays_o"], rays["rays_d"], aux["occ"], pcfg,
                          aabb=aabb)
        return out["hit"], out["t0"], out["t1"]

    @jax.jit
    def raw_rays_only(aux, poses_d, intr_d, aabb):
        rays = rays_from_frame_indices(poses_d, intr_d, H, H, inds, fids)
        return rays["rays_o"].sum() + rays["rays_d"].sum()

    intr_d = jnp.asarray(np.asarray(intr, np.float32))
    aabb_d = jnp.asarray(aabb_eff, jnp.float32)
    for label, fn in (("raw ray_prepass 640k (1 jit)", raw_pre),
                      ("ray-gen only 640k", raw_rays_only)):
        fn(trainer.aux, jnp.asarray(poses[0][None]), intr_d, aabb_d)
        ts = []
        for i in range(10):
            t0 = time.perf_counter()
            out = fn(trainer.aux, jnp.asarray(poses[1 + i % 7][None]),
                     intr_d, aabb_d)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        print(f"{label}: median {np.median(ts[2:])*1000:.1f} ms "
              f"(min {min(ts)*1000:.1f})", flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Eval-chunk stage bisect on the real TPU: where do the milliseconds
of one 16384-ray eval chunk go (march / compact / network / place+
composite), at the inference dials from README "Inference".

Relay-honest: inputs vary per call (pose folds the trial index), n>=20,
block_until_ready between stages."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, n=20):
    out = fn(0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(1, n + 1):
        out = fn(i)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:52s} {dt*1e3:9.2f} ms/call", flush=True)
    return dt


def main():
    from ngp_tpu.config import NetworkConfig, RenderConfig, TrainConfig
    from ngp_tpu.data.nerf_dataset import NeRFDataset
    from ngp_tpu.data.synthetic import make_synthetic_dataset
    from ngp_tpu.models.nerf import NeRFNetwork
    from ngp_tpu.models import occupancy as om
    from ngp_tpu.training.nerf_grid import GridNeRFTrainer

    H = int(os.environ.get("NGP_H", "800"))
    cache = f"/root/.ngp_infer_{H}"
    make_synthetic_dataset(cache, n_train=16, n_val=8, n_test=1, H=H, W=H)
    train_ds = NeRFDataset(cache, split="train", scale=0.8)

    render_cfg = RenderConfig(
        bound=1.0, min_near=0.05, dt_gamma=0.0, max_steps=256,
        max_samples_per_ray=32, grid_size=128, density_thresh=10.0,
        turbo=True, coarse_candidates=96, crossing_slots=16,
        compact_mean_samples=8,
    )
    # NGP_CC: eval-time coarse-candidate budget (the trainer's
    # eval_coarse_candidates dial, default 64) — applied to the
    # measured cfg only, training keeps 96
    eval_cc = os.environ.get("NGP_CC")
    if os.environ.get("NGP_HQ"):  # the turbo-hq flagship (bench config)
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
    train_cfg = TrainConfig(
        iters=30000, lr=1e-2, num_rays=16384, workspace="/tmp/ebs_ws",
        update_extra_interval=16,
    )
    model = NeRFNetwork(cfg=net_cfg, render=render_cfg)
    trainer = GridNeRFTrainer(
        model, render_cfg, train_cfg, log_every=10**9, use_tensorboard=False
    )
    trainer.ensure_initialized()
    trainer.mark_untrained(train_ds.poses, train_ds.intrinsics, train_ds.H, train_ds.W)
    ei = trainer.make_loader(train_ds)
    done = 0
    while done < 600:
        for b in ei():
            trainer.step(b)
            done += 1
            if done >= 600:
                break
    jax.block_until_ready(trainer.state.params)
    print("settled", flush=True)

    params = trainer.eval_params()
    aux = trainer.aux
    occ = aux["occ"]
    density_fn, color_fn, _ = trainer._fns(params)
    N = int(os.environ.get("NGP_N", "16384"))
    S_eval = int(os.environ.get("NGP_EMAX", "16"))
    ems = int(os.environ.get("NGP_EMS", "4"))
    budget = N * ems
    if eval_cc:
        import dataclasses

        render_cfg = dataclasses.replace(
            render_cfg, coarse_candidates=int(eval_cc)
        )
    aabb = jnp.asarray(np.asarray(render_cfg.aabb, np.float32))

    # eval ray pool: real frame rays, shuffled (frame-average occupancy)
    from ngp_tpu.data.raysampler import rays_from_indices

    rng = np.random.default_rng(0)
    pose = jnp.asarray(np.asarray(train_ds.poses[0], np.float32))
    intr = jnp.asarray(np.asarray(train_ds.intrinsics, np.float32))
    n = train_ds.H * train_ds.W
    perm = rng.permutation(n)[: N].astype(np.int32)
    inds = jnp.asarray(perm)

    def rays_of(i):
        # different pixels per trial: rotate the permutation
        ii = jnp.roll(inds, i * 97)
        r = rays_from_indices(pose, intr, train_ds.H, train_ds.W, ii)
        return r["rays_o"], r["rays_d"]

    ALIGN = om.ALIGN

    @jax.jit
    def stage_march(i):
        ro, rd = rays_of(i)
        m = om.march_rays_turbo(ro, rd, occ, render_cfg, max_samples=S_eval,
                                aabb=aabb)
        return m["ts"]

    @jax.jit
    def stage_compact(i):
        ro, rd = rays_of(i)
        m = om.march_rays_turbo(ro, rd, occ, render_cfg, max_samples=S_eval,
                                aabb=aabb)
        S = m["mask"].shape[1]
        n_total8 = jnp.minimum((m["n_total"] + ALIGN - 1) // ALIGN * ALIGN, S)
        mask8 = jnp.arange(S, dtype=jnp.int32)[None, :] < n_total8[:, None]
        src, valid, offsets, t_c = om.compact_valid_samples(
            mask8, budget, extra=m["ts"]
        )
        return src, t_c

    @jax.jit
    def stage_network(i):
        ro, rd = rays_of(i)
        m = om.march_rays_turbo(ro, rd, occ, render_cfg, max_samples=S_eval,
                                aabb=aabb)
        S = m["mask"].shape[1]
        n_total8 = jnp.minimum((m["n_total"] + ALIGN - 1) // ALIGN * ALIGN, S)
        mask8 = jnp.arange(S, dtype=jnp.int32)[None, :] < n_total8[:, None]
        src, valid, offsets, t_c = om.compact_valid_samples(
            mask8, budget, extra=m["ts"]
        )
        ray_row = jnp.concatenate(
            [ro, rd, jnp.zeros((N, 2), jnp.float32)], axis=-1
        )
        ray_b = src[::ALIGN] // S
        rr = jnp.repeat(jnp.take(ray_row, ray_b, axis=0), ALIGN, axis=0)
        pts = jnp.clip(
            rr[:, 0:3] + rr[:, 3:6] * t_c[:, None],
            -render_cfg.bound, render_cfg.bound,
        )
        sigmas, geo = density_fn(pts)
        rgbs = color_fn(rr[:, 3:6], geo)
        return sigmas, rgbs

    @jax.jit
    def stage_full(i):
        ro, rd = rays_of(i)
        out = om.render_rays_grid_turbo(
            density_fn, color_fn, ro, rd, occ, render_cfg,
            max_samples=S_eval, aabb=aabb, budget=budget,
        )
        return out["image"]

    @jax.jit
    def stage_density_only(i):
        # network cost split: density (encode + sigma MLP) vs color
        ro, rd = rays_of(i)
        m = om.march_rays_turbo(ro, rd, occ, render_cfg, max_samples=S_eval,
                                aabb=aabb)
        S = m["mask"].shape[1]
        n_total8 = jnp.minimum((m["n_total"] + ALIGN - 1) // ALIGN * ALIGN, S)
        mask8 = jnp.arange(S, dtype=jnp.int32)[None, :] < n_total8[:, None]
        src, valid, offsets, t_c = om.compact_valid_samples(
            mask8, budget, extra=m["ts"]
        )
        ray_row = jnp.concatenate(
            [ro, rd, jnp.zeros((N, 2), jnp.float32)], axis=-1
        )
        ray_b = src[::ALIGN] // S
        rr = jnp.repeat(jnp.take(ray_row, ray_b, axis=0), ALIGN, axis=0)
        pts = jnp.clip(
            rr[:, 0:3] + rr[:, 3:6] * t_c[:, None],
            -render_cfg.bound, render_cfg.bound,
        )
        sigmas, geo = density_fn(pts)
        return sigmas

    print(f"config: N={N} S_eval={S_eval} ems={ems} budget={budget} "
          f"max_steps={render_cfg.max_steps}", flush=True)
    t_march = timeit("march only", stage_march)
    t_comp = timeit("march + compact", stage_compact)
    t_dens = timeit("march + compact + density", stage_density_only)
    t_net = timeit("march + compact + density + color", stage_network)
    t_full = timeit("full render (+place+composite)", stage_full)
    print(f"\ndeltas: march {t_march*1e3:.2f}  compact {(t_comp-t_march)*1e3:.2f}  "
          f"density {(t_dens-t_comp)*1e3:.2f}  color {(t_net-t_dens)*1e3:.2f}  "
          f"place+composite {(t_full-t_net)*1e3:.2f}  ms", flush=True)


if __name__ == "__main__":
    main()

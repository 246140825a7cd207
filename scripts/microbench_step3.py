#!/usr/bin/env python
"""Round-3 train-step breakdown at the bench config (turbo-hq):
forward-only loss vs value_and_grad vs full step (+opt+EMA), varied
ray batches per call (tunnel-honest timing)."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, n=30):
    out = fn(0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(1, n + 1):
        out = fn(i)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:40s} {dt*1e3:9.2f} ms/call", flush=True)
    return dt


def main():
    from ngp_tpu.config import NetworkConfig, RenderConfig, TrainConfig
    from ngp_tpu.data.nerf_dataset import NeRFDataset
    from ngp_tpu.data.synthetic import make_synthetic_dataset
    from ngp_tpu.models.nerf import NeRFNetwork
    from ngp_tpu.training.nerf_grid import GridNeRFTrainer
    from ngp_tpu.training.state import apply_gradients

    cache = os.environ.get("NGP_BENCH_DATA", "/root/.ngp_bench_data")
    make_synthetic_dataset(cache, n_train=16, n_val=1, n_test=1, H=400, W=400)
    train_ds = NeRFDataset(cache, split="train", scale=0.8)

    render_cfg = RenderConfig(
        bound=1.0, min_near=0.05, dt_gamma=0.0, max_steps=256,
        max_samples_per_ray=32, grid_size=128, density_thresh=10.0,
        turbo=True, coarse_candidates=96, crossing_slots=16,
        compact_mean_samples=8,
    )
    net_cfg = NetworkConfig(
        encoding="cpgrid", use_bf16=True,
        cp_resolutions=(128, 256, 512, 1024, 2048), cp_rank=128,
        cp_freq_degree=6,
    )
    train_cfg = TrainConfig(
        iters=30000, lr=1e-2, num_rays=16384, workspace="/tmp/mb3_ws",
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
    while done < 400:  # settle the grid to steady-state sparsity
        for b in ei():
            m = trainer.step(b)
            done += 1
            if done >= 400:
                break
    jax.block_until_ready(trainer.state.params)
    print("settled", flush=True)

    batch = next(iter(ei()))
    state, aux = trainer.state, trainer.aux
    N = train_cfg.num_rays
    rng0 = jax.random.PRNGKey(7)

    from ngp_tpu.data.raysampler import rays_from_indices, sample_ray_indices

    def make_rays(i):
        k = jax.random.fold_in(rng0, i)
        inds = sample_ray_indices(k, train_ds.H, train_ds.W, N)["inds"]
        rays = rays_from_indices(
            batch["poses"][0], batch["intrinsics"], train_ds.H, train_ds.W, inds
        )
        image = batch["images"][0].reshape(-1, 4)[inds]
        gt = image[..., :3] * image[..., 3:] + (1.0 - image[..., 3:])
        return rays["rays_o"], rays["rays_d"], gt, k

    def loss_of(params, i):
        ro, rd, gt, k = make_rays(i)
        out = trainer.render_batch(params, ro, rd, rng=k, perturb=True,
                                   bg_color=jnp.float32(1.0), aux=aux)
        return jnp.mean((out["image"] - gt) ** 2)

    fwd = jax.jit(lambda p, i: loss_of(p, i))
    vg = jax.jit(lambda p, i: jax.value_and_grad(loss_of)(p, i))
    grads0 = vg(state.params, 0)[1]

    # vary the grads per call (traced i-dependent scale) — repeated
    # IDENTICAL inputs through the remote relay report fake timings
    # (CLAUDE.md benchmarking rules)
    def opt_step(s, g, i):
        scale = 1.0 + 1e-12 * i.astype(jnp.float32)
        g = jax.tree.map(lambda x: x * scale.astype(x.dtype), g)
        return apply_gradients(s, g, trainer.tx, ema_decay=trainer.ema_decay)

    opt = jax.jit(opt_step)

    timeit("forward loss only", lambda i: fwd(state.params, i))
    timeit("value_and_grad", lambda i: vg(state.params, i)[0])
    timeit("optimizer+EMA apply (varied grads)",
           lambda i: opt(state, grads0, jnp.int32(i)).step)

    def march_only(i):
        ro, rd, _, k = make_rays(i)
        from ngp_tpu.models import occupancy as om
        m = om.march_rays_turbo(ro, rd, aux["occ"], render_cfg, rng=k, perturb=True)
        return m["ts"]

    timeit("march only", jax.jit(march_only))


if __name__ == "__main__":
    main()

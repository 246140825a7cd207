#!/usr/bin/env python
"""North-star protocol run (BASELINE.md): 800x800 hard procedural
scene, wall-clock-capped training (default 5 min of steady-state train
time, the reference's 30k-step lego budget on V100), eval on the FULL
held-out split at 800x800, PSNR + SSIM reported.

Env: NGP_SECONDS (train seconds after compile, default 300),
NGP_MAXSTEPS (stop at a step count instead — the reference's own
30k-step protocol, readme.md:213; overrides NGP_SECONDS when set),
NGP_ERROR_MAP=1 (enable error-map sampling), NGP_PRESET
(turbo-hq default | turbo), NGP_VIEWS (default 50), NGP_H (default 800),
NGP_VARIANT (default hard).
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

    seconds = float(os.environ.get("NGP_SECONDS", "300"))
    max_steps = int(os.environ.get("NGP_MAXSTEPS", "0"))
    use_error_map = os.environ.get("NGP_ERROR_MAP", "0") == "1"
    preset = os.environ.get("NGP_PRESET", "turbo-hq")
    n_views = int(os.environ.get("NGP_VIEWS", "50"))
    H = int(os.environ.get("NGP_H", "800"))
    variant = os.environ.get("NGP_VARIANT", "hard")

    cache = f"/root/.ngp_northstar_{variant}_{H}_{n_views}"
    t0 = time.perf_counter()
    make_synthetic_dataset(
        cache, n_train=n_views, n_val=8, n_test=8, H=H, W=H, variant=variant
    )
    print(f"dataset ready in {time.perf_counter()-t0:.0f}s", flush=True)
    train_ds = NeRFDataset(cache, split="train", scale=0.8,
                           error_map=use_error_map)
    val_ds = NeRFDataset(cache, split="val", scale=0.8)

    render_cfg = RenderConfig(
        bound=1.0, min_near=0.05, dt_gamma=0.0, max_steps=256,
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
            cp_resolutions=(256, 512, 1024, 2048), cp_rank=64,
            cp_freq_degree=5,
        )
    train_cfg = TrainConfig(
        iters=30000, lr=1e-2, num_rays=16384,
        workspace=f"/tmp/northstar_{'em' if use_error_map else 'base'}",
        update_extra_interval=16, error_map=use_error_map,
        error_map_uniform_frac=float(os.environ.get("NGP_EM_MIX", "0.5")),
        # 256 default: at this protocol's 16384 rays a 128^2 map is
        # provably inert (every cell drawn without replacement)
        error_map_size=int(os.environ.get("NGP_EM_SIZE", "256")),
    )
    model = NeRFNetwork(cfg=net_cfg, render=render_cfg)
    trainer = GridNeRFTrainer(
        model, render_cfg, train_cfg, log_every=10**9, use_tensorboard=False
    )
    trainer.ensure_initialized()
    trainer.mark_untrained(train_ds.poses, train_ds.intrinsics, train_ds.H, train_ds.W)
    if use_error_map:
        trainer.enable_error_map(len(train_ds))

    epoch_iter = trainer.make_loader(train_ds)

    # compile + settle with a few steps before the wall-clock window
    it = iter(epoch_iter())

    def next_batch():
        nonlocal it
        try:
            return next(it)
        except StopIteration:
            it = iter(epoch_iter())
            return next(it)

    for _ in range(20):
        m = trainer.step(next_batch())
    jax.block_until_ready(m)
    print("compiled; starting timed window", flush=True)

    t_start = time.perf_counter()
    done = 0
    while True:
        m = trainer.step(next_batch())
        done += 1
        if done % 200 == 0:
            jax.block_until_ready(m)
            el = time.perf_counter() - t_start
            print(f"step {done}: loss {float(m['loss']):.5f} ({el:.0f}s)",
                  flush=True)
            every = int(os.environ.get("NGP_EVAL_EVERY", "0"))
            if every and done % every == 0 and (not max_steps or done < max_steps):
                r = trainer.evaluate(val_ds, max_frames=2)
                if use_error_map:
                    em = np.asarray(trainer.aux["error_map"])
                    print(f"  em max {em.max():.2e} p99 "
                          f"{np.percentile(em, 99):.2e}", flush=True)
                print(f"  eval@{done}: psnr {r['psnr']:.2f}", flush=True)
            if max_steps and done >= max_steps:
                break
            if not max_steps and el >= seconds:
                break
    jax.block_until_ready(trainer.state.params)
    wall = time.perf_counter() - t_start
    print(f"trained {done} steps in {wall:.0f}s "
          f"({done/wall:.1f} steps/s)", flush=True)

    t_eval = time.perf_counter()
    res = trainer.evaluate(val_ds, with_ssim=True)
    print(f"eval over {len(val_ds)} frames at {H}x{H} in "
          f"{time.perf_counter()-t_eval:.0f}s: {res}", flush=True)
    print(f"RESULT preset={preset} error_map={use_error_map} "
          f"steps={done} wall={wall:.0f}s psnr={res['psnr']:.2f} "
          f"ssim={res.get('ssim', float('nan')):.4f}", flush=True)


if __name__ == "__main__":
    main()

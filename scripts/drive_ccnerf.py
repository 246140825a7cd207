#!/usr/bin/env python
"""Drive CCNeRF end-to-end on the real TPU: rank-residual training
steady-state steps/s on the shared turbo march, eval PSNR after
finalize, and PSNR at each compression level.

There is no direct CCNeRF row in the reference's performance table;
the closest anchors are TensoRF's 51 it/s x 4096 rays (readme.md:218)
for speed and the reference's own save/eval-per-compression-level
protocol (main_CCNeRF.py:206-227) for quality.

Env: NGP_STEPS (default 3000), NGP_RAYS (4096), NGP_VARIANT (default).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np


def main():
    from ngp_tpu.config import RenderConfig, TrainConfig
    from ngp_tpu.data.nerf_dataset import NeRFDataset
    from ngp_tpu.data.synthetic import make_synthetic_dataset
    from ngp_tpu.models.ccnerf import CCNeRF, CCNeRFConfig
    from ngp_tpu.training.ccnerf import CCNeRFTrainer

    n_steps = int(os.environ.get("NGP_STEPS", "3000"))
    n_rays = int(os.environ.get("NGP_RAYS", "4096"))
    variant = os.environ.get("NGP_VARIANT", "default")
    H = 400
    if variant == "hard":
        cache = f"/root/.ngp_emab_hard_{H}"
        make_synthetic_dataset(cache, n_train=24, n_val=4, n_test=1,
                               H=H, W=H, variant="hard")
    else:
        cache = f"/root/.ngp_drive_default_{H}_16"
        make_synthetic_dataset(cache, n_train=16, n_val=1, n_test=1, H=H, W=H)
    train_ds = NeRFDataset(cache, split="train", scale=0.8)
    val_ds = NeRFDataset(cache, split="val", scale=0.8)

    render_cfg = RenderConfig(
        bound=1.0, min_near=0.05, dt_gamma=0.0, max_steps=256,
        max_samples_per_ray=32, grid_size=128, density_thresh=10.0,
        turbo=True, coarse_candidates=96, crossing_slots=16,
        compact_mean_samples=8,
    )
    train_cfg = TrainConfig(
        iters=30000, lr=2e-2, num_rays=n_rays, workspace="/tmp/cc_ws",
        update_extra_interval=16,
    )
    model = CCNeRF(CCNeRFConfig(), bound=1.0)
    trainer = CCNeRFTrainer(
        model, render_cfg, train_cfg, log_every=10**9, use_tensorboard=False
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
    print(f"ccnerf-turbo: steady-state {sps:.1f} steps/s = "
          f"{sps*n_rays:,.0f} rays/s (vs TensoRF-V100 51 it/s anchor "
          f"{sps*n_rays/208896:.2f})", flush=True)

    params = jax.device_get(trainer.state.params)
    fused = model.finalize(params)
    trainer.state = trainer.state.replace(params=fused, ema_params=None)
    trainer._jit_render_chunks = {}
    res = trainer.evaluate(val_ds, with_ssim=True)
    print(f"finalized full-rank: {res}", flush=True)
    for ranks in [(64, 16, 64, 64), (64, 8, 64, 16), (64, 2, 64, 4)]:
        small_model = CCNeRF(CCNeRFConfig(), bound=1.0)
        small_model.finalized = True
        small_model.cfg = model.cfg
        small = small_model.compress(
            {k: [dict(g) for g in v] for k, v in fused.items()}, ranks
        )
        st = CCNeRFTrainer(
            small_model, render_cfg, train_cfg, log_every=10**9,
            use_tensorboard=False,
        )
        st.ensure_initialized()
        st.state = st.state.replace(params=small, ema_params=None)
        st.aux = trainer.aux
        res = st.evaluate(val_ds)
        print(f"compressed ranks={ranks}: PSNR {res['psnr']:.2f}", flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Drive TensoRF end-to-end on the real TPU: steady-state steps/s at
the final factor resolution + eval PSNR, for the v1 masked marcher vs
the turbo march (model-agnostic flagship path).

Reference baseline: 51 train it/s x 4096 rays ~= 0.21 M rays/s on V100
(readme.md:218).

Env knobs: NGP_MARCH=turbo|v1, NGP_STEPS, NGP_RAYS, NGP_RES1,
NGP_CP=1 (CP decomposition instead of VM), NGP_VARIANT=hard (textured
quality scene, 24 views), NGP_EVAL_FRAMES (eval split size).
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
    from ngp_tpu.models.tensorf import TensoRFCPNetwork, TensoRFNetwork
    from ngp_tpu.training.tensorf import TensoRFTrainer

    march = os.environ.get("NGP_MARCH", "turbo")
    use_cp = os.environ.get("NGP_CP", "0") == "1"
    n_steps = int(os.environ.get("NGP_STEPS", "1500"))
    n_rays = int(os.environ.get("NGP_RAYS", "4096"))
    res1 = int(os.environ.get("NGP_RES1", "300"))
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

    turbo = march == "turbo"
    render_cfg = RenderConfig(
        bound=1.0, min_near=0.05, dt_gamma=0.0,
        max_steps=256 if turbo else 1024,
        max_samples_per_ray=32 if turbo else 256,
        grid_size=128, density_thresh=10.0,
        turbo=turbo, coarse_candidates=96, crossing_slots=16,
        compact_mean_samples=8,
    )
    train_cfg = TrainConfig(
        iters=30000, lr=2e-2, num_rays=n_rays, workspace="/tmp/tsf_ws",
        update_extra_interval=16,
    )
    if use_cp:
        model = TensoRFCPNetwork(resolution=(128, 128, 128))
    else:
        model = TensoRFNetwork(resolution=(128, 128, 128))
    trainer = TensoRFTrainer(
        model, render_cfg, train_cfg, lr_net=1e-3,
        upsample_model_steps=[500],  # jump straight to the final res
        resolution0=128, resolution1=res1,
        log_every=10**9, use_tensorboard=False,
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
            if done % 250 == 0:
                jax.block_until_ready(metrics)
                print(
                    f"step {done}: loss {float(metrics['loss']):.5f} "
                    f"res {trainer.current_resolution} "
                    f"({time.perf_counter()-t_start:.1f}s)", flush=True,
                )
            if done == n_steps - 256:
                jax.block_until_ready(metrics)
                window_t0 = time.perf_counter()
            if done >= n_steps:
                break
    jax.block_until_ready(trainer.state.params)
    dt = time.perf_counter() - window_t0
    sps = 256 / dt
    kind = ("cp" if use_cp else "vm") + f"-{march}"
    print(
        f"{kind}: steady-state {sps:.1f} steps/s = "
        f"{sps*n_rays:,.0f} rays/s (vs TensoRF-V100 baseline "
        f"{sps*n_rays/208896:.2f}) at res {trainer.current_resolution}",
        flush=True,
    )
    n_eval = int(os.environ.get("NGP_EVAL_FRAMES", str(len(val_ds))))
    res = trainer.evaluate(val_ds, max_frames=n_eval, with_ssim=True)
    print(f"eval[{kind}]:", res, flush=True)
    # test-render speed (reference 2.8 it/s = 357 ms/frame on V100,
    # readme.md:218): median wall + device time over varied poses
    trainer.eval_mean_samples = 4
    walls, devs = [], []
    trainer.render_frames(
        np.asarray(val_ds.poses[0], np.float32)[None], val_ds.intrinsics,
        val_ds.H, val_ds.W, want_depth=False,
    )  # compile
    for i in range(5):
        p = np.asarray(val_ds.poses[i % len(val_ds)], np.float32)[None]
        t0 = time.perf_counter()
        fin = trainer.render_frames(
            p, val_ds.intrinsics, val_ds.H, val_ds.W,
            want_depth=False, async_result=True,
        )
        if fin.device_arrays[0] is not None:
            jax.block_until_ready(fin.device_arrays[0])
        devs.append(time.perf_counter() - t0)
        fin()
        walls.append(time.perf_counter() - t0)
    print(
        f"test[{kind}] {val_ds.W}x{val_ds.H}: device "
        f"{float(np.median(devs))*1000:.0f} ms/frame, wall "
        f"{float(np.median(walls))*1000:.0f} ms", flush=True,
    )


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Split render_frame wall time into device compute / transfer / host
staging on the real TPU (drives the jitted chunk renderer directly)."""
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
    while done < 1000:
        for batch in epoch_iter():
            m = trainer.step(batch)
            done += 1
            if done >= 1000:
                break
    jax.block_until_ready(trainer.state.params)
    print("trained", flush=True)

    chunk = 16384
    params = trainer.eval_params()
    intr = val_ds.intrinsics
    aabb = np.asarray(render_cfg.aabb, np.float32)
    n = H * H
    perm = trainer._frame_perm(n)

    render = trainer._chunk_renderer(chunk, H, H)

    def prep(pose):
        t0 = time.perf_counter()
        sel = perm
        bbox = trainer._project_aabb_bbox(pose, intr, H, H, aabb)
        if bbox is not None:
            r0, r1, c0, c1 = bbox
            rows, cols = sel // H, sel % H
            keep = (rows >= r0) & (rows <= r1) & (cols >= c0) & (cols <= c1)
            sel = sel[keep]
        m = sel.size
        C = max(1, -(-m // chunk))
        C = 1 << (C - 1).bit_length() if C <= 8 else -(-C // 8) * 8
        pad = C * chunk - m
        inds = np.concatenate([sel, np.full(pad, sel[-1])]) if pad else sel
        fids = np.zeros_like(inds)
        host_s = time.perf_counter() - t0
        return sel, inds.reshape(C, chunk).astype(np.int32), fids.reshape(C, chunk).astype(np.int32), host_s

    # warmup/compile
    pose = np.asarray(val_ds.poses[0], np.float32)
    sel, inds, fids, _ = prep(pose)
    img, dep = render(params, trainer.aux, jnp.asarray(pose[None]), jnp.asarray(np.asarray(intr, np.float32)),
                      jnp.asarray(inds), jnp.asarray(fids), jnp.asarray(aabb))
    jax.block_until_ready((img, dep))
    print(f"compiled; culled rays/frame ~{sel.size} in {inds.size} padded slots", flush=True)

    for trial in range(4):
        pose = np.asarray(val_ds.poses[trial + 1], np.float32)
        t0 = time.perf_counter()
        sel, inds_a, fids_a, host_s = prep(pose)
        t1 = time.perf_counter()
        di = jnp.asarray(inds_a); df = jnp.asarray(fids_a)
        dp = jnp.asarray(pose[None]); dintr = jnp.asarray(np.asarray(intr, np.float32)); dab = jnp.asarray(aabb)
        jax.block_until_ready((di, df))
        t2 = time.perf_counter()
        img, dep = render(params, trainer.aux, dp, dintr, di, df, dab)
        jax.block_until_ready((img, dep))
        t3 = time.perf_counter()
        img_h = np.asarray(img); dep_h = np.asarray(dep)
        t4 = time.perf_counter()
        image = np.ones((n, 3), np.float32)
        image[sel] = img_h.reshape(-1, 3)[: sel.size] / 255.0
        t5 = time.perf_counter()
        print(
            f"trial {trial}: host-prep {t1-t0:.3f}s upload {t2-t1:.3f}s "
            f"device {t3-t2:.3f}s download {t4-t3:.3f}s scatter {t5-t4:.3f}s "
            f"TOTAL {t5-t0:.3f}s", flush=True,
        )


if __name__ == "__main__":
    main()

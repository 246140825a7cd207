#!/usr/bin/env python
"""Device-only eval-render time per dial config, interleaved rounds to
cancel tunnel/time drift. Uses the jitted chunk renderer directly."""
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
        iters=30000, lr=1e-2, num_rays=16384, workspace="/tmp/infer_ws",
        update_extra_interval=16,
    )
    model = NeRFNetwork(cfg=net_cfg, render=render_cfg)
    trainer = GridNeRFTrainer(
        model, render_cfg, train_cfg, log_every=10**9, use_tensorboard=False
    )
    trainer.ensure_initialized()
    trainer.eval_tight_march = os.environ.get("NGP_TIGHT", "1") == "1"
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

    chunk = int(os.environ.get("NGP_CHUNK", "16384"))
    params = trainer.eval_params()
    intr = jnp.asarray(np.asarray(val_ds.intrinsics, np.float32))
    # emulate render_frames' tight-march setup (this script drives the
    # chunk renderer directly)
    aabb_np = np.asarray(render_cfg.aabb, np.float32)
    box = trainer._fetch_eval_tight_box()
    if box is not None:
        lo = np.maximum(aabb_np[:3], box[:3])
        hi = np.minimum(aabb_np[3:], box[3:])
        aabb_np = np.concatenate([lo, hi])
        trainer._set_eval_lattice_span(aabb_np)
        print(f"tight box: {np.round(aabb_np, 3)} "
              f"span bucket {trainer._eval_lattice_span}", flush=True)
    aabb = jnp.asarray(aabb_np)
    n = H * H
    perm = trainer._frame_perm(n)
    C = -(-n // chunk)
    C = 1 << (C - 1).bit_length() if C <= 8 else -(-C // 8) * 8
    pad = C * chunk - n
    inds_np = np.concatenate([perm, np.full(pad, perm[-1])]).reshape(C, chunk).astype(np.int32)
    di = jnp.asarray(inds_np)
    df = jnp.zeros_like(di)
    poses_d = [jnp.asarray(np.asarray(val_ds.poses[i], np.float32)[None]) for i in range(6)]

    configs = [
        # name, ems, max_samples, stride, coarse_candidates
        ("base", 8, None, 1, None),
        ("ems4-max16", 4, 16, 1, None),
        ("stride2", 8, None, 2, None),
        ("ems4-max16-s2", 4, 16, 2, None),
        ("ems2-max8-s2", 2, 8, 2, None),
    ]
    spec = os.environ.get("NGP_CONFIGS", "")
    if spec:  # "name:ems:max:stride:cc;..." ('-' = None)
        configs = []
        for part in spec.split(";"):
            nm, ems, mx, st, cc = part.split(":")
            configs.append((
                nm, int(ems) if ems != "-" else None,
                int(mx) if mx != "-" else None, int(st),
                int(cc) if cc != "-" else None,
            ))
    gt = np.asarray(val_ds.images[0], np.float32)
    if gt.shape[-1] == 4:
        gt = gt[..., :3] * gt[..., 3:] + 1.0 * (1 - gt[..., 3:])

    renders = {}
    for name, ems, mx, st, cc in configs:
        trainer.eval_mean_samples = ems
        trainer.eval_max_samples = mx
        trainer.eval_probe_stride = st
        trainer.eval_coarse_candidates = cc
        trainer._jit_render_chunks = {}
        r = trainer._chunk_renderer(chunk, H, H)
        t0 = time.perf_counter()
        out = r(params, trainer.aux, poses_d[0], intr, di, df, aabb)
        jax.block_until_ready(out)
        img, _ = trainer.render_frame(val_ds.poses[0], intr, H, H, chunk=chunk)
        mse = float(np.mean((np.asarray(img, np.float64) - gt) ** 2))
        print(f"{name}: compiled in {time.perf_counter()-t0:.0f}s, "
              f"PSNR {10*np.log10(1/max(mse,1e-12)):.2f}", flush=True)
        renders[name] = r

    times = {name: [] for name, *_ in configs}
    for rnd in range(3):
        for name, *_ in configs:
            r = renders[name]
            t0 = time.perf_counter()
            for i in range(2):
                out = r(params, trainer.aux, poses_d[1 + (rnd + i) % 5], intr, di, df, aabb)
                jax.block_until_ready(out)
            times[name].append((time.perf_counter() - t0) / 2)
    for name, *_ in configs:
        ts = times[name]
        print(f"{name}: device {min(ts)*1000:.0f} ms/frame "
              f"(runs: {', '.join(f'{t*1000:.0f}' for t in ts)})", flush=True)


if __name__ == "__main__":
    main()

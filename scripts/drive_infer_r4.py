#!/usr/bin/env python
"""Round-4 inference measurement: the two-round eval march (prepass
cull + per-ray t-range) vs the round-3 single-round path.

Methodology matches scripts/drive_infer_device.py (the README eval
table): poses vary per call, block_until_ready after each dispatch,
median over interleaved rounds; "device" time counts the jitted
dispatches (prepass + main render) with device-resident weights and
excludes the u8 image download that the remote tunnel adds (a local
deployment pays PCIe microseconds for it).

Env: NGP_H (default 800), NGP_HQ=1 (turbo-hq flagship), NGP_CHUNK
(default 4096), NGP_STEPS (train steps, default 1000), NGP_CONFIGS
("name:ems:max:stride:cc:prepass;...", '-' = None).
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
    if os.environ.get("NGP_HQ", "1") == "1":  # turbo-hq flagship default
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
            m = trainer.step(batch)
            done += 1
            if done >= n_steps:
                break
    jax.block_until_ready(trainer.state.params)
    print(f"trained {n_steps}", flush=True)

    chunk = int(os.environ.get("NGP_CHUNK", "4096"))
    gt = np.asarray(val_ds.images[0], np.float32)
    if gt.shape[-1] == 4:
        gt = gt[..., :3] * gt[..., 3:] + 1.0 * (1 - gt[..., 3:])
    intr = val_ds.intrinsics

    configs = [
        # name, ems, max_samples, stride, coarse_candidates, prepass,
        # t_proxy (transmittance-proxy early-out threshold, None = off),
        # direct_cap (static per-ray cap, enables the no-compaction
        # render; None = compacted path), chunk override,
        # prepass pixel stride
        ("pre-ems6", 6, None, 1, 64, 1, None, None, None, 1, None),
        ("tp1e2-ems6", 6, None, 1, 64, 1, 1e-2, None, None, 1, None),
        ("tp1e3-ems6", 6, None, 1, 64, 1, 1e-3, None, None, 1, None),
        ("tp1e3-nodrop", None, None, 1, 64, 1, 1e-3, None, None, 1, None),
        ("pre-nodrop", None, None, 1, 64, 1, None, None, None, 1, None),
    ]
    spec = os.environ.get("NGP_CONFIGS", "")
    if spec:
        configs = []
        for part in spec.split(";"):
            fields = part.split(":") + ["-"] * 11
            nm, ems, mx, st, cc, pp, tp, dc, ck, ps, mb = fields[:11]
            configs.append((
                nm, int(ems) if ems != "-" else None,
                int(mx) if mx != "-" else None, int(st),
                int(cc) if cc != "-" else None, int(pp),
                float(tp) if tp != "-" else None,
                int(dc) if dc != "-" else None,
                int(ck) if ck != "-" else None,
                int(ps) if ps != "-" else 1,
                int(mb) if mb != "-" else None,
            ))

    def render_once(pose):
        """One frame through the REAL path (render_frames); returns
        (img, wall_s, device_s) where device_s = prepass dispatch+sync
        + cull/index build + main render dispatch AND completion
        (block_until_ready on the device buffers), excluding only the
        image download/scatter that the remote tunnel inflates."""
        t_all = time.perf_counter()
        fin = trainer.render_frames(
            np.asarray(pose, np.float32)[None], intr, H, H, chunk=chunk,
            want_depth=False, async_result=True,
        )
        if fin.device_arrays[0] is not None:
            jax.block_until_ready(fin.device_arrays[0])
        dev = time.perf_counter() - t_all
        img, _ = (lambda r: (r[0][0], r[1][0]))(fin())
        wall = time.perf_counter() - t_all
        return img, wall, dev

    base_chunk = chunk
    for name, ems, mx, st, cc, pp, tp, dc, ck, ps, mb in configs:
        trainer.eval_mean_samples = ems
        trainer.eval_max_samples = mx
        trainer.eval_probe_stride = st
        trainer.eval_coarse_candidates = cc
        trainer.eval_prepass = bool(pp)
        trainer.eval_t_proxy = tp
        trainer.eval_direct = dc is not None
        trainer.eval_direct_cap = dc
        trainer.eval_prepass_stride = ps
        trainer.eval_map_batch = mb
        chunk = ck or base_chunk
        trainer._jit_render_chunks = {}
        t0 = time.perf_counter()
        img, _, _ = render_once(val_ds.poses[0])  # compile
        # one more pose to compile the second C bucket if any
        render_once(val_ds.poses[1])
        mse = float(np.mean((np.asarray(img, np.float64) - gt) ** 2))
        print(f"{name}: compiled {time.perf_counter()-t0:.0f}s, "
              f"PSNR {10*np.log10(1/max(mse,1e-12)):.2f}", flush=True)
        walls, devs = [], []
        for i in range(6):
            _, w, d = render_once(val_ds.poses[1 + i % 7])
            walls.append(w)
            devs.append(d)
        print(f"{name}: device {np.median(devs)*1000:.0f} ms/frame "
              f"(min {min(devs)*1000:.0f}), wall {np.median(walls)*1000:.0f} "
              f"ms ({1/np.median(devs):.2f} fps device)", flush=True)


if __name__ == "__main__":
    main()

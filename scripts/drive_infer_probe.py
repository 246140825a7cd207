#!/usr/bin/env python
"""Instrumented breakdown of the two-round eval frame render: prepass
dispatch+download, host cull/index build, index upload, main render
dispatch+completion — plus hit fraction, chunk count and span bucket.
Replicates render_frames' orchestration with timers."""
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
    trainer.mark_untrained(train_ds.poses, train_ds.intrinsics,
                           train_ds.H, train_ds.W)
    epoch_iter = trainer.make_loader(train_ds)
    done = 0
    n_steps = int(os.environ.get("NGP_STEPS", "1000"))
    while done < n_steps:
        for batch in epoch_iter():
            m = trainer.step(batch)
            done += 1
            if done >= n_steps:
                break
    jax.block_until_ready(trainer.state.params)
    print("trained", flush=True)

    chunk = int(os.environ.get("NGP_CHUNK", "4096"))
    ems = os.environ.get("NGP_EMS", "8")
    trainer.eval_mean_samples = None if ems == "-" else int(ems)
    trainer.eval_coarse_candidates = 64
    tp = os.environ.get("NGP_TPROXY", "")
    trainer.eval_t_proxy = float(tp) if tp else None
    intr = val_ds.intrinsics
    n = H * H

    gt = np.asarray(val_ds.images[0], np.float32)
    if gt.shape[-1] == 4:
        gt = gt[..., :3] * gt[..., 3:] + 1.0 * (1 - gt[..., 3:])

    def probe(pose):
        t = {}
        poses = np.asarray(pose, np.float32)[None]
        t0 = time.perf_counter()
        aabb_eff = np.asarray(render_cfg.aabb, np.float32)
        box = trainer._fetch_eval_tight_box()
        if box is not None:
            lo = np.maximum(aabb_eff[:3], box[:3])
            hi = np.minimum(aabb_eff[3:], box[3:])
            aabb_eff = np.concatenate([lo, hi])
            trainer._set_eval_lattice_span(aabb_eff)
        box_span = trainer._eval_lattice_span
        pre = trainer._run_eval_prepass(poses, intr, H, H, aabb_eff)
        t["prepass"] = time.perf_counter() - t0
        trainer._set_eval_lattice_span_value(pre["span"])
        t1 = time.perf_counter()
        C = max(1, -(-pre["count"] // chunk))
        C = 1 << (C - 1).bit_length() if C <= 8 else -(-C // 16) * 16
        C = min(C, max(1, -(-n // chunk)))
        ckey = ("dev_C", H, H, chunk)  # sticky-max, as render_frames
        C = max(C, trainer._device_inds_cache.get(ckey, 0))
        trainer._device_inds_cache[ckey] = C
        di, df = trainer._sorted_chunk_slices(pre["sorted_inds"], C, chunk)
        t["slice"] = time.perf_counter() - t1
        t3 = time.perf_counter()
        render = trainer._chunk_renderer(chunk, H, H, with_t_range=True)
        img, dep = render(
            trainer.eval_params(), trainer.aux, jnp.asarray(poses),
            jnp.asarray(np.asarray(intr, np.float32)), di, df,
            jnp.asarray(aabb_eff), pre["t0"], pre["t1"],
            jnp.zeros((1,), jnp.float32),
        )
        jax.block_until_ready(img)
        t["render"] = time.perf_counter() - t3
        t["total"] = time.perf_counter() - t0
        info = dict(count=pre["count"], C=C, box_span=box_span,
                    ray_span=pre["span"], bucket=trainer._eval_lattice_span)
        return t, info

    chunks = [int(c) for c in
              os.environ.get("NGP_CHUNKS", str(chunk)).split(",")]
    for chunk in chunks:
        t, info = probe(val_ds.poses[0])  # compile
        img0, _ = trainer.render_frame(val_ds.poses[0], intr, H, H,
                                       chunk=chunk)
        mse = float(np.mean((np.asarray(img0, np.float64) - gt) ** 2))
        print(f"chunk {chunk}: compiled, PSNR "
              f"{10*np.log10(1/max(mse,1e-12)):.2f}", info, flush=True)
        for i in range(4):
            t, info = probe(val_ds.poses[1 + i % 7])
            print({k: round(v * 1000) for k, v in t.items()}, info,
                  flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Error-map sampling A/B diagnostic.

The 30k-step north-star pair read base 33.39 dB vs --error_map 30.89 dB
(round-4): error-map sampling DEGRADES long runs on the hard scene.
This script bisects: same scene at 400x400, eval every NGP_EVERY steps,
configs = base / error-map / error-map at a non-degenerate ray count,
with error-map content stats logged (at num_rays == 128^2 the Gumbel
top-k selects every coarse cell, so sampling is stratified-uniform and
the map content is irrelevant — any gap vs base is then a pure
stratified-vs-iid pixel-sampling effect).

Env: NGP_STEPS (default 12000), NGP_EVERY (default 2000), NGP_CONFIG
(comma list of base|em|em4096, default all), NGP_H (default 400).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np


def run_one(name, n_rays, use_em, steps, every, H, mean_samples=6,
            uniform_frac=0.0):
    from ngp_tpu.config import NetworkConfig, RenderConfig, TrainConfig
    from ngp_tpu.data.nerf_dataset import NeRFDataset
    from ngp_tpu.data.synthetic import make_synthetic_dataset
    from ngp_tpu.models.nerf import NeRFNetwork
    from ngp_tpu.training.nerf_grid import GridNeRFTrainer

    cache = f"/root/.ngp_emab_hard_{H}"
    make_synthetic_dataset(cache, n_train=24, n_val=4, n_test=1, H=H, W=H,
                           variant="hard")
    train_ds = NeRFDataset(cache, split="train", scale=0.8)
    val_ds = NeRFDataset(cache, split="val", scale=0.8)

    render_cfg = RenderConfig(
        bound=1.0, min_near=0.05, dt_gamma=0.0, max_steps=256,
        max_samples_per_ray=32, grid_size=128, density_thresh=10.0,
        turbo=True, coarse_candidates=96, crossing_slots=16,
        compact_mean_samples=mean_samples,
    )
    net_cfg = NetworkConfig(
        encoding="cpgrid", use_bf16=True,
        cp_resolutions=(128, 256, 512, 1024, 2048), cp_rank=128,
        cp_freq_degree=6,
    )
    train_cfg = TrainConfig(
        iters=steps, lr=1e-2, num_rays=n_rays,
        workspace=f"/tmp/emab_{name}", update_extra_interval=16,
        error_map=use_em, error_map_uniform_frac=uniform_frac,
    )
    model = NeRFNetwork(cfg=net_cfg, render=render_cfg)
    trainer = GridNeRFTrainer(
        model, render_cfg, train_cfg, log_every=10**9, use_tensorboard=False
    )
    trainer.ensure_initialized()
    trainer.mark_untrained(train_ds.poses, train_ds.intrinsics,
                           train_ds.H, train_ds.W)
    if use_em:
        trainer.enable_error_map(len(train_ds))

    epoch_iter = trainer.make_loader(train_ds)
    it = iter(epoch_iter())

    def nxt():
        nonlocal it
        try:
            return next(it)
        except StopIteration:
            it = iter(epoch_iter())
            return next(it)

    done = 0
    t0 = time.perf_counter()
    ovf = []
    while done < steps:
        m = trainer.step(nxt())
        done += 1
        if done % 50 == 0 and "turbo_overflow" in m:
            ovf.append(float(m["turbo_overflow"]))
        if done % every == 0:
            jax.block_until_ready(m)
            res = trainer.evaluate(val_ds)
            extra = ""
            if use_em:
                em = np.asarray(trainer.aux["error_map"])
                extra = (f" em[med {np.median(em):.2e} "
                         f"p99 {np.percentile(em, 99):.2e} "
                         f"max {em.max():.2e}]")
            if ovf:
                extra += f" ovf[{np.median(ovf):.2f}]"
                ovf = []
            occ = trainer.aux["occ"]
            nocc = int(np.asarray(occ.occ_grid.sum()))
            print(f"[{name}] step {done}: psnr {res['psnr']:.2f} "
                  f"loss {float(m['loss']):.5f} occ {nocc}{extra} "
                  f"({time.perf_counter()-t0:.0f}s)", flush=True)
    print(f"[{name}] done {steps} steps in {time.perf_counter()-t0:.0f}s",
          flush=True)


def main():
    steps = int(os.environ.get("NGP_STEPS", "12000"))
    every = int(os.environ.get("NGP_EVERY", "2000"))
    H = int(os.environ.get("NGP_H", "400"))
    which = os.environ.get("NGP_CONFIG", "base,em,em4096").split(",")
    for name in which:
        if name == "base":
            run_one("base", 16384, False, steps, every, H)
        elif name == "base4096":
            run_one("base4096", 4096, False, steps, every, H)
        elif name == "em":
            run_one("em", 16384, True, steps, every, H)
        elif name == "em4096":
            run_one("em4096", 4096, True, steps, every, H)
        elif name == "em4096mix":
            # half uniform: bounds the batch's sample need; error share
            # still concentrates on hard cells
            run_one("em4096mix", 4096, True, steps, every, H,
                    uniform_frac=0.5)
        elif name == "em4096m16":
            # full weighting, budget raised to carry all-object batches
            run_one("em4096m16", 4096, True, steps, every, H,
                    mean_samples=16)
        elif name == "emmix":
            run_one("emmix", 16384, True, steps, every, H,
                    uniform_frac=0.5)


if __name__ == "__main__":
    main()

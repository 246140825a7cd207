#!/usr/bin/env python
"""Capture a jax.profiler trace of the bench-config train step and
print the top device ops by self time (parsed from the trace proto).

Usage: python scripts/profile_step_r3.py [outdir]
"""
import glob
import gzip
import json
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

    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ngp_trace"
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
        iters=30000, lr=1e-2, num_rays=16384, workspace="/tmp/bench_ws",
        update_extra_interval=16,
    )
    model = NeRFNetwork(cfg=net_cfg, render=render_cfg)
    trainer = GridNeRFTrainer(
        model, render_cfg, train_cfg, log_every=10**9, use_tensorboard=False
    )
    trainer.ensure_initialized()
    trainer.mark_untrained(
        train_ds.poses, train_ds.intrinsics, train_ds.H, train_ds.W
    )
    epoch_iter = trainer.make_loader(train_ds)

    def run_steps(n):
        done = 0
        while done < n:
            for batch in epoch_iter():
                trainer.step(batch)
                done += 1
                if done >= n:
                    break
        jax.block_until_ready(trainer.state.params)

    run_steps(384)  # steady-state grid
    with jax.profiler.trace(outdir):
        run_steps(48)
    print("trace written to", outdir, flush=True)

    # ---- parse the trace: top ops by self time -------------------------
    files = sorted(
        glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                  recursive=True),
        key=os.path.getmtime,
    )
    if not files:
        print("no trace.json.gz found (remote backend may not emit one)")
        return
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device-side complete events, keyed by op name
    by_name = {}
    for e in events:
        if e.get("ph") != "X":
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0)  # us
        args = e.get("args") or {}
        # keep XLA op events (they carry 'long_name' or hlo args) and
        # anything on a TPU device track
        key = name
        acc = by_name.setdefault(key, [0, 0])
        acc[0] += dur
        acc[1] += 1
    rows = sorted(by_name.items(), key=lambda kv: -kv[1][0])[:45]
    print(f"{'op':70s} {'total_ms':>10s} {'n':>6s}")
    for name, (dur, cnt) in rows:
        print(f"{name[:70]:70s} {dur/1e3:10.2f} {cnt:6d}")


if __name__ == "__main__":
    main()

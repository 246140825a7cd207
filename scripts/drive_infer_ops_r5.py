#!/usr/bin/env python
"""Round-5 OP-LEVEL device-time attribution of the default eval frame.

drive_infer_profile_r5.py sums the "XLA Modules" plane (per-module
device ms/frame); this drive descends one level to "XLA Ops" and
groups execution spans by op-name family (%copy, %sort, %fusion,
custom-call kernels, ...) so HBM-layout copies and compaction sorts
can be attributed and re-measured after hot-path changes (e.g. the
block-granularity compaction sort).

Methodology per CLAUDE.md: varied poses per call, on-chip profiler
spans on the /device:TPU:0 plane (wall time through the relay
over-counts ~2x), PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python for
the xplane parse.

Env: NGP_H (800), NGP_STEPS (1000), NGP_CHUNK (4096), NGP_EMS (6),
NGP_PS (2 = eval_prepass_stride), NGP_TOP (20 rows).
"""
import collections
import glob
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import jax
import jax.profiler
import numpy as np


def parse_ops(logdir, n_frames):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    f = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                         recursive=True))[-1]
    with open(f, "rb") as fh:
        xs.ParseFromString(fh.read())
    dev = [p for p in xs.planes if p.name == "/device:TPU:0"]
    if not dev:
        return None, None, float("nan")
    dev = dev[0]
    emeta = {m.id: m.name for m in dev.event_metadata.values()}
    fams = collections.Counter()
    ops = collections.Counter()
    mod_total = 0.0
    for line in dev.lines:
        if line.name == "XLA Modules":
            for ev in line.events:
                mod_total += ev.duration_ps / 1e9
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            nm = emeta.get(ev.metadata_id, str(ev.metadata_id))
            ms = ev.duration_ps / 1e9
            base = nm.split("(")[0]
            ops[base] += ms
            # family: strip %, trailing .N / -digits
            fam = base.lstrip("%")
            fam = fam.split(".")[0]
            fam = fam.rstrip("0123456789-_")
            fams[fam] += ms
    return (
        {k: v / n_frames for k, v in fams.items()},
        {k: v / n_frames for k, v in ops.items()},
        mod_total / n_frames,
    )


def main():
    from ngp_tpu.config import NetworkConfig, RenderConfig, TrainConfig
    from ngp_tpu.data.nerf_dataset import NeRFDataset
    from ngp_tpu.data.synthetic import make_synthetic_dataset
    from ngp_tpu.models.nerf import NeRFNetwork
    from ngp_tpu.training.nerf_grid import GridNeRFTrainer

    H = int(os.environ.get("NGP_H", "800"))
    n_steps = int(os.environ.get("NGP_STEPS", "1000"))
    top = int(os.environ.get("NGP_TOP", "20"))
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
    trainer.mark_untrained(train_ds.poses, train_ds.intrinsics, train_ds.H,
                           train_ds.W)
    epoch_iter = trainer.make_loader(train_ds)
    done = 0
    while done < n_steps:
        for batch in epoch_iter():
            trainer.step(batch)
            done += 1
            if done >= n_steps:
                break
    jax.block_until_ready(trainer.state.params)
    print(f"trained {n_steps}", flush=True)

    trainer.eval_mean_samples = int(os.environ.get("NGP_EMS", "6"))
    trainer.eval_probe_stride = 1
    trainer.eval_coarse_candidates = 64
    trainer.eval_prepass_stride = int(os.environ.get("NGP_PS", "2"))
    chunk = int(os.environ.get("NGP_CHUNK", "4096"))
    intr = val_ds.intrinsics
    poses = [np.asarray(val_ds.poses[i], np.float32) for i in range(8)]

    def once(i):
        fin = trainer.render_frames(
            poses[i][None], intr, H, H, chunk=chunk, want_depth=False,
            async_result=True,
        )
        if fin.device_arrays[0] is not None:
            jax.block_until_ready(fin.device_arrays[0])
        return fin

    once(0)  # compile
    once(1)
    logdir = "/tmp/prof_ops_r5"
    shutil.rmtree(logdir, ignore_errors=True)
    with jax.profiler.trace(logdir):
        for i in range(3):
            once(2 + i)
    fams, ops, mod_total = parse_ops(logdir, 3)
    print(f"module total: {mod_total:.1f} ms/frame", flush=True)
    print("-- op families (ms/frame) --", flush=True)
    for k, v in sorted(fams.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {v:7.2f}  {k}", flush=True)
    print("-- top individual ops (ms/frame) --", flush=True)
    for k, v in sorted(ops.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {v:7.2f}  {k[:100]}", flush=True)


if __name__ == "__main__":
    main()

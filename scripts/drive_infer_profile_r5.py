#!/usr/bin/env python
"""Round-5 DEVICE-TIME eval sweep via the on-chip profiler.

Wall-clock through the remote-TPU tunnel over-counts frame cost ~2x
(measured: ems6 wall 266-290 ms vs 137 ms of actual XLA module
execution on the device plane; pipelining can't hide it — the relay
serializes dispatch). The defensible per-frame metric for comparing
against the reference's V100 numbers is therefore the device plane's
"XLA Modules" span sum, which this drive records per eval-dial config:
trace 3 frames per config, parse the xplane, report device ms/frame
split by module (prepass / slice / render) plus PSNR.

Env: NGP_H (800), NGP_STEPS (1000), NGP_CHUNK (4096), NGP_CONFIGS
("name:ems:mx:st:cc:tp:ps;..." with '-' = None).
"""
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


def parse_trace(logdir, n_frames):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    import collections

    xs = xplane_pb2.XSpace()
    f = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                         recursive=True))[-1]
    with open(f, "rb") as fh:
        xs.ParseFromString(fh.read())
    dev = [p for p in xs.planes if p.name == "/device:TPU:0"]
    if not dev:
        return None
    dev = dev[0]
    emeta = {m.id: m.name for m in dev.event_metadata.values()}
    tot = collections.Counter()
    for line in dev.lines:
        if line.name == "XLA Modules":
            for ev in line.events:
                nm = emeta.get(ev.metadata_id, str(ev.metadata_id))
                tot[nm.split("(")[0]] += ev.duration_ps / 1e9
    return {k: v / n_frames for k, v in tot.items()}


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

    chunk = int(os.environ.get("NGP_CHUNK", "4096"))
    intr = val_ds.intrinsics
    poses = [np.asarray(val_ds.poses[i], np.float32) for i in range(8)]
    gt = np.asarray(val_ds.images[0], np.float32)
    if gt.shape[-1] == 4:
        gt = gt[..., :3] * gt[..., 3:] + 1.0 * (1 - gt[..., 3:])

    configs = [
        # name, ems, mx, probe_stride, cc, t_proxy, prepass_stride, chunk
        ("ems6", 6, None, 1, 64, None, 1, None),
        ("ems6tp4", 6, None, 1, 64, 1e-4, 1, None),
        ("ems6mx16tp4", 6, 16, 1, 64, 1e-4, 1, None),
        ("ems6tp4s2", 6, None, 1, 64, 1e-4, 2, None),
        ("ems4tp4", 4, None, 1, 64, 1e-4, 1, None),
        ("ems8tp4", 8, None, 1, 64, 1e-4, 1, None),
    ]
    spec = os.environ.get("NGP_CONFIGS", "")
    if spec:
        configs = []
        for part in spec.split(";"):
            nm, ems, mx, st, cc, tp, ps, ck = (part.split(":") + ["-"] * 8)[:8]
            configs.append((
                nm, int(ems) if ems != "-" else None,
                int(mx) if mx != "-" else None, int(st),
                int(cc) if cc != "-" else None,
                float(tp) if tp != "-" else None,
                int(ps) if ps != "-" else 1,
                int(ck) if ck != "-" else None,
            ))

    for name, ems, mx, st, cc, tp, ps, ck in configs:
        trainer.eval_mean_samples = ems
        trainer.eval_max_samples = mx
        trainer.eval_probe_stride = st
        trainer.eval_coarse_candidates = cc
        trainer.eval_t_proxy = tp
        trainer.eval_prepass_stride = ps
        trainer._jit_render_chunks = {}
        trainer._jit_prepass = {}
        cchunk = ck or chunk

        def once(i, async_only=True):
            fin = trainer.render_frames(
                poses[i][None], intr, H, H, chunk=cchunk, want_depth=False,
                async_result=True,
            )
            if fin.device_arrays[0] is not None:
                jax.block_until_ready(fin.device_arrays[0])
            return fin

        fin = once(0)  # compile
        img, _ = (lambda r: (r[0][0], r[1][0]))(fin())
        once(1)
        mse = float(np.mean((np.asarray(img, np.float64) - gt) ** 2))
        psnr = 10 * np.log10(1 / max(mse, 1e-12))
        # wall (synced, tunnel-inclusive) for the record
        walls = []
        for i in range(4):
            t0 = time.perf_counter()
            once(1 + i % 7)
            walls.append(time.perf_counter() - t0)
        logdir = f"/tmp/prof_sweep_{name}"
        shutil.rmtree(logdir, ignore_errors=True)
        with jax.profiler.trace(logdir):
            for i in range(3):
                once(4 + i)
        mods = parse_trace(logdir, 3)
        dev_total = sum(mods.values()) if mods else float("nan")
        split = ", ".join(
            f"{k.replace('jit_', '')} {v:.1f}" for k, v in sorted(
                (mods or {}).items(), key=lambda kv: -kv[1])[:4]
        )
        print(f"{name}: PSNR {psnr:.2f} | device {dev_total:.0f} ms/frame "
              f"({split}) | wall {np.median(walls)*1000:.0f} ms", flush=True)


if __name__ == "__main__":
    main()

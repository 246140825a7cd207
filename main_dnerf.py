#!/usr/bin/env python
"""D-NeRF (dynamic scene) training CLI.

TPU-native equivalent of the reference's ``main_dnerf.py``: deformation
network (default) or temporal-basis variant, time-sliced occupancy
grid, per-frame times from the dataset.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("path", type=str)
    parser.add_argument("-O", action="store_true")
    parser.add_argument("--test", action="store_true")
    parser.add_argument("--workspace", type=str, default="workspace")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--iters", type=int, default=30000)
    parser.add_argument("--lr", type=float, default=1e-2)
    parser.add_argument("--ckpt", type=str, default="latest")
    parser.add_argument("--num_rays", type=int, default=4096)
    parser.add_argument("--max_steps", type=int, default=1024)
    parser.add_argument("--update_extra_interval", type=int, default=16)
    parser.add_argument("--fp16", action="store_true")
    parser.add_argument("--basis", action="store_true", help="temporal-basis variant")
    parser.add_argument("--hyper", action="store_true", help="hyper (ambient-dim) variant")
    parser.add_argument("--cuda_ray", action="store_true", help="accelerated marching (TPU grid path; always on here)")
    parser.add_argument("--preload", action="store_true", help="no-op: data is always device-resident on TPU")
    parser.add_argument("--color_space", type=str, default="srgb", choices=["srgb", "linear"])
    parser.add_argument("--error_map", action="store_true")
    parser.add_argument("--max_ray_batch", type=int, default=4096)
    parser.add_argument("--lr_net", type=float, default=1e-3,
                        help="accepted for parity (single optax lr schedule)")
    parser.add_argument("--bg_radius", type=float, default=-1)
    parser.add_argument("--gui", action="store_true", help="serve the browser viewer")
    parser.add_argument("--W", type=int, default=800)
    parser.add_argument("--H", type=int, default=800)
    parser.add_argument("--radius", type=float, default=5.0)
    parser.add_argument("--fovy", type=float, default=50.0)
    parser.add_argument("--max_spp", type=int, default=64)
    parser.add_argument("--bound", type=float, default=2.0)
    parser.add_argument("--scale", type=float, default=0.33)
    parser.add_argument("--offset", type=float, nargs="*", default=[0, 0, 0])
    parser.add_argument("--dt_gamma", type=float, default=1 / 128)
    parser.add_argument("--min_near", type=float, default=0.2)
    parser.add_argument("--density_thresh", type=float, default=10)
    parser.add_argument("--time_size", type=int, default=64)
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--downscale", type=int, default=1)
    parser.add_argument("--epochs", type=int, default=0)
    opt = parser.parse_args()

    from ngp_tpu.config import NetworkConfig, RenderConfig, TrainConfig
    from ngp_tpu.data.nerf_dataset import NeRFDataset
    from ngp_tpu.models.dnerf import DNeRFBasisNetwork, DNeRFNetwork
    from ngp_tpu.training.dnerf import DNeRFTrainer

    if opt.synthetic:
        from ngp_tpu.data.synthetic import make_synthetic_dataset

        make_synthetic_dataset(opt.path, dynamic=True)

    # -O = recommended settings: on TPU the accelerated marcher is the
    # turbo path (time-sliced packed payloads, dynamic_slice on the
    # traced time — the CUDA kernel's bitfield[floor(time*T)] indexing,
    # dnerf/renderer.py:283-285)
    turbo = bool(opt.O)
    render_cfg = RenderConfig(
        bound=opt.bound, min_near=opt.min_near, density_thresh=opt.density_thresh,
        dt_gamma=opt.dt_gamma,
        max_steps=min(opt.max_steps, 256) if turbo else opt.max_steps,
        time_size=opt.time_size,
        bg_radius=opt.bg_radius,
        turbo=turbo,
        max_samples_per_ray=32 if turbo else 256,
        compact_mean_samples=8,
    )
    net_cfg = NetworkConfig(use_bf16=opt.fp16 or opt.O)
    train_cfg = TrainConfig(
        iters=opt.iters, lr=opt.lr, num_rays=opt.num_rays, seed=opt.seed,
        workspace=opt.workspace, update_extra_interval=opt.update_extra_interval,
        color_space=opt.color_space, error_map=opt.error_map,
    )
    if opt.hyper:
        from ngp_tpu.models.dnerf import DNeRFHyperNetwork

        cls = DNeRFHyperNetwork
    else:
        cls = DNeRFBasisNetwork if opt.basis else DNeRFNetwork
    model = cls(cfg=net_cfg, render=render_cfg)
    trainer = DNeRFTrainer(model, render_cfg, train_cfg, name="dnerf")

    test_ds = NeRFDataset(opt.path, split="test", scale=opt.scale, offset=opt.offset, downscale=opt.downscale)
    if opt.test:
        trainer.load_checkpoint(None if opt.ckpt == "latest" else opt.ckpt)
        if test_ds.has_gt:
            trainer.evaluate(test_ds)
        return

    train_ds = NeRFDataset(opt.path, split="train", scale=opt.scale, offset=opt.offset, downscale=opt.downscale, seed=opt.seed, color_space=opt.color_space)
    valid_ds = NeRFDataset(opt.path, split="val", scale=opt.scale, offset=opt.offset, downscale=opt.downscale, color_space=opt.color_space)
    trainer.max_ray_batch = opt.max_ray_batch
    if opt.gui:
        from ngp_tpu.viewer import InteractiveSession
        from ngp_tpu.viewer_web import serve

        trainer.load_checkpoint(None if opt.ckpt == "latest" else opt.ckpt)
        serve(InteractiveSession(trainer, train_ds, max_spp=opt.max_spp),
              W=opt.W, H=opt.H, radius=opt.radius, fovy=opt.fovy)
        return
    max_epochs = opt.epochs or max(1, opt.iters // len(train_ds))
    trainer.train_on_dataset(train_ds, valid_ds, max_epochs=max_epochs)
    if test_ds.has_gt:
        trainer.evaluate(test_ds)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""TensoRF training CLI.

TPU-native equivalent of the reference's ``main_tensoRF.py``: VM (or
--cp) decomposition with L1 sparsity, two learning rates, progressive
upsampling with log-spaced resolutions, occupancy shrink, grid-
accelerated marching.
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
    parser.add_argument("--lr0", type=float, default=2e-2, help="lr for decomposition factors")
    parser.add_argument("--lr1", type=float, default=1e-3, help="lr for networks")
    parser.add_argument("--ckpt", type=str, default="latest")
    parser.add_argument("--num_rays", type=int, default=4096)
    parser.add_argument("--cuda_ray", action="store_true")
    parser.add_argument("--max_steps", type=int, default=1024)
    parser.add_argument("--update_extra_interval", type=int, default=16)
    parser.add_argument("--l1_reg_weight", type=float, default=1e-4)
    parser.add_argument("--fp16", action="store_true")
    parser.add_argument("--cp", action="store_true", help="use the CP decomposition")
    parser.add_argument("--resolution0", type=int, default=128)
    parser.add_argument("--resolution1", type=int, default=300)
    parser.add_argument("--upsample_model_steps", type=int, action="append",
                        default=[2000, 3000, 4000, 5500, 7000])
    parser.add_argument("--bound", type=float, default=2.0)
    parser.add_argument("--scale", type=float, default=0.33)
    parser.add_argument("--offset", type=float, nargs="*", default=[0, 0, 0])
    parser.add_argument("--dt_gamma", type=float, default=1 / 128)
    parser.add_argument("--min_near", type=float, default=0.2)
    parser.add_argument("--density_thresh", type=float, default=10)
    parser.add_argument("--bg_radius", type=float, default=-1)
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--preload", action="store_true", help="no-op: data is always device-resident on TPU")
    parser.add_argument("--color_space", type=str, default="srgb", choices=["srgb", "linear"])
    parser.add_argument("--error_map", action="store_true")
    parser.add_argument("--patch_size", type=int, default=1)
    parser.add_argument("--max_ray_batch", type=int, default=4096)
    parser.add_argument("--gui", action="store_true", help="serve the browser viewer")
    parser.add_argument("--W", type=int, default=800)
    parser.add_argument("--H", type=int, default=800)
    parser.add_argument("--radius", type=float, default=5.0)
    parser.add_argument("--fovy", type=float, default=50.0)
    parser.add_argument("--max_spp", type=int, default=64)
    parser.add_argument("--downscale", type=int, default=1)
    parser.add_argument("--epochs", type=int, default=0)
    opt = parser.parse_args()
    # -O = recommended settings (reference main_tensoRF.py:107-110:
    # fp16 + cuda_ray + preload). On TPU the accelerated marcher is the
    # turbo path — model-agnostic (density/color callbacks), the same
    # flagship march the NeRF workload uses.
    turbo = False
    if opt.O:
        opt.fp16 = True
        opt.cuda_ray = True
        turbo = True
        opt.max_steps = min(opt.max_steps, 256)

    from ngp_tpu.config import RenderConfig, TrainConfig
    from ngp_tpu.data.nerf_dataset import NeRFDataset
    from ngp_tpu.models.tensorf import TensoRFCPNetwork, TensoRFNetwork
    from ngp_tpu.training.tensorf import TensoRFTrainer

    if opt.synthetic:
        from ngp_tpu.data.synthetic import make_synthetic_dataset

        make_synthetic_dataset(opt.path)

    render_cfg = RenderConfig(
        bound=opt.bound, min_near=opt.min_near, density_thresh=opt.density_thresh,
        bg_radius=opt.bg_radius, dt_gamma=opt.dt_gamma, max_steps=opt.max_steps,
        turbo=turbo,
        max_samples_per_ray=32 if turbo else 256,
        compact_mean_samples=8,
    )
    train_cfg = TrainConfig(
        iters=opt.iters, lr=opt.lr0, num_rays=opt.num_rays, seed=opt.seed,
        workspace=opt.workspace, update_extra_interval=opt.update_extra_interval,
        color_space=opt.color_space, error_map=opt.error_map,
        patch_size=opt.patch_size,
    )
    r0 = opt.resolution0
    if opt.cp:
        model = TensoRFCPNetwork(resolution=(r0, r0, r0))
    else:
        model = TensoRFNetwork(resolution=(r0, r0, r0), bg_radius=opt.bg_radius)

    trainer = TensoRFTrainer(
        model, render_cfg, train_cfg,
        lr_net=opt.lr1, l1_reg_weight=opt.l1_reg_weight,
        upsample_model_steps=opt.upsample_model_steps,
        resolution0=opt.resolution0, resolution1=opt.resolution1,
    )

    trainer.max_ray_batch = opt.max_ray_batch
    if opt.gui:
        from ngp_tpu.viewer import InteractiveSession
        from ngp_tpu.viewer_web import serve

        trainer.load_checkpoint(None if opt.ckpt == "latest" else opt.ckpt)
        gui_train_ds = NeRFDataset(
            opt.path, split="train", scale=opt.scale, offset=opt.offset,
            downscale=opt.downscale, seed=opt.seed, color_space=opt.color_space,
        )
        serve(InteractiveSession(trainer, gui_train_ds, max_spp=opt.max_spp),
              W=opt.W, H=opt.H, radius=opt.radius, fovy=opt.fovy)
        return


    test_ds = NeRFDataset(opt.path, split="test", scale=opt.scale, offset=opt.offset, downscale=opt.downscale, color_space=opt.color_space)
    if opt.test:
        trainer.load_checkpoint(None if opt.ckpt == "latest" else opt.ckpt)
        if test_ds.has_gt:
            trainer.evaluate(test_ds)
        trainer.test(test_ds)
        return

    train_ds = NeRFDataset(opt.path, split="train", scale=opt.scale, offset=opt.offset, downscale=opt.downscale, seed=opt.seed, color_space=opt.color_space)
    valid_ds = NeRFDataset(opt.path, split="val", scale=opt.scale, offset=opt.offset, downscale=opt.downscale, color_space=opt.color_space)
    max_epochs = opt.epochs or max(1, opt.iters // len(train_ds))
    trainer.train_on_dataset(train_ds, valid_ds, max_epochs=max_epochs)
    if test_ds.has_gt:
        trainer.evaluate(test_ds)
    trainer.test(test_ds)


if __name__ == "__main__":
    main()

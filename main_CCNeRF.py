#!/usr/bin/env python
"""CCNeRF training / compression / composition CLI.

TPU-native equivalent of the reference's ``main_CCNeRF.py``: rank-
residual training, then ``finalize`` and evaluation at every
compression level (main_CCNeRF.py:206-227), and optionally a composed
multi-object scene rendered from per-object transforms
(main_CCNeRF.py:89-140).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("path", type=str)
    parser.add_argument("-O", action="store_true")
    parser.add_argument("--test", action="store_true")
    parser.add_argument("--compose", action="store_true", help="demo: compose the trained object with a translated copy")
    parser.add_argument("--workspace", type=str, default="workspace")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--iters", type=int, default=30000)
    parser.add_argument("--lr", type=float, default=2e-2)
    parser.add_argument("--ckpt", type=str, default="latest")
    parser.add_argument("--num_rays", type=int, default=4096)
    parser.add_argument("--max_steps", type=int, default=1024)
    parser.add_argument("--update_extra_interval", type=int, default=16)
    parser.add_argument("--bound", type=float, default=1.0)
    parser.add_argument("--scale", type=float, default=0.8)
    parser.add_argument("--offset", type=float, nargs="*", default=[0, 0, 0])
    parser.add_argument("--dt_gamma", type=float, default=0.0)
    parser.add_argument("--min_near", type=float, default=0.2)
    parser.add_argument("--density_thresh", type=float, default=10)
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

    from ngp_tpu.config import RenderConfig, TrainConfig
    from ngp_tpu.data.nerf_dataset import NeRFDataset
    from ngp_tpu.models.ccnerf import CCNeRF, CCNeRFConfig
    from ngp_tpu.training.ccnerf import CCNeRFTrainer

    if opt.synthetic:
        from ngp_tpu.data.synthetic import make_synthetic_dataset

        make_synthetic_dataset(opt.path)

    # -O: the accelerated marcher on TPU is the turbo matmul march —
    # CCNeRF's residual training shares one march across every rank
    # prefix (render_rays_grid_turbo_multi)
    turbo = bool(opt.O)
    render_cfg = RenderConfig(
        bound=opt.bound, min_near=opt.min_near, density_thresh=opt.density_thresh,
        dt_gamma=opt.dt_gamma,
        max_steps=min(opt.max_steps, 256) if turbo else opt.max_steps,
        turbo=turbo,
        max_samples_per_ray=32 if turbo else 256,
    )
    train_cfg = TrainConfig(
        iters=opt.iters, lr=opt.lr, num_rays=opt.num_rays, seed=opt.seed,
        workspace=opt.workspace, update_extra_interval=opt.update_extra_interval,
        color_space=opt.color_space, error_map=opt.error_map,
        patch_size=opt.patch_size,
    )
    cfg = CCNeRFConfig()
    model = CCNeRF(cfg, bound=opt.bound)
    trainer = CCNeRFTrainer(model, render_cfg, train_cfg)

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

    if not opt.test:
        train_ds = NeRFDataset(opt.path, split="train", scale=opt.scale, offset=opt.offset, downscale=opt.downscale, seed=opt.seed, color_space=opt.color_space)
        valid_ds = NeRFDataset(opt.path, split="val", scale=opt.scale, offset=opt.offset, downscale=opt.downscale, color_space=opt.color_space)
        max_epochs = opt.epochs or max(1, opt.iters // len(train_ds))
        trainer.load_checkpoint(None if opt.ckpt == "latest" else opt.ckpt)
        trainer.train_on_dataset(train_ds, valid_ds, max_epochs=max_epochs)
    else:
        trainer.load_checkpoint(None if opt.ckpt == "latest" else opt.ckpt)

    # evaluate at every compression level (reference: save/eval per level)
    import jax

    params = jax.device_get(trainer.state.params)
    fused = model.finalize(params)
    trainer.state = trainer.state.replace(params=fused, ema_params=None)
    trainer._jit_render_chunk = None
    trainer._jit_render_chunks = {}
    if test_ds.has_gt:
        res = trainer.evaluate(test_ds, max_frames=2)
        trainer.log(f"finalized full-rank: PSNR {res['psnr']:.2f}")
    for ranks in [(64, 16, 64, 64), (64, 8, 64, 16), (64, 2, 64, 4)]:
        small_model = CCNeRF(CCNeRFConfig(), bound=opt.bound)
        small_model.finalized = True
        small_model.cfg = model.cfg
        small = small_model.compress({k: [dict(g) for g in v] for k, v in fused.items()}, ranks)
        small_trainer = CCNeRFTrainer(small_model, render_cfg, train_cfg, use_tensorboard=False)
        small_trainer.ensure_initialized()
        small_trainer.state = small_trainer.state.replace(params=small, ema_params=None)
        small_trainer.aux = trainer.aux
        if test_ds.has_gt:
            res = small_trainer.evaluate(test_ds, max_frames=2)
            small_trainer.log(f"compressed ranks={ranks}: PSNR {res['psnr']:.2f}")

    if opt.compose:
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = 0.6  # translated copy
        scene = CCNeRF(model.cfg, bound=opt.bound).compose(
            [(model, fused), (model, fused)],
            transforms=[None, (T, np.eye(3, dtype=np.float32))],
        )
        scene_trainer = CCNeRFTrainer(scene, render_cfg, train_cfg, use_tensorboard=False)
        scene_trainer.ensure_initialized()
        scene_trainer.aux = trainer.aux
        out = scene_trainer.test(test_ds, write_video=True)
        scene_trainer.log(f"composed scene rendered to {out}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""SDF training CLI.

TPU-native equivalent of the reference's ``main_sdf.py``: train an
instant-ngp style SDF network on a mesh, evaluate, and export a
marching-cubes mesh. Same flag surface; ``--test`` skips training.
"""

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("path", help="mesh file (.obj/.ply), or 'sphere' for a procedural test mesh")
    parser.add_argument("--test", action="store_true")
    parser.add_argument("--workspace", type=str, default="workspace")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--fp16", action="store_true", help="bf16 mixed precision (TPU)")
    parser.add_argument("--ff", action="store_true", help="accepted for parity (single flax backbone on TPU)")
    parser.add_argument("--tcnn", action="store_true", help="accepted for parity (single flax backbone on TPU)")
    parser.add_argument("--epochs", type=int, default=20)
    parser.add_argument("--num_samples", type=int, default=2**18)
    parser.add_argument("--clip_sdf", type=float, default=None)
    parser.add_argument("--mesh_resolution", type=int, default=256)
    opt = parser.parse_args()

    from ngp_tpu.data.mesh import icosphere
    from ngp_tpu.data.sdf_dataset import SDFDataset
    from ngp_tpu.models.sdf import SDFNetwork
    from ngp_tpu.training.sdf import SDFTrainer

    model = SDFNetwork(clip_sdf=opt.clip_sdf, use_bf16=opt.fp16)

    if opt.path == "sphere":
        v, f = icosphere(subdiv=5, radius=1.0)
        kw = {"vertices": v, "faces": f}
    else:
        kw = {"path": opt.path}

    train_ds = SDFDataset(
        size=100, num_samples=opt.num_samples, clip_sdf=opt.clip_sdf, seed=opt.seed, **kw
    )
    valid_ds = SDFDataset(
        size=1, num_samples=opt.num_samples, clip_sdf=opt.clip_sdf, seed=opt.seed + 1, **kw
    )

    trainer = SDFTrainer(
        model,
        workspace=opt.workspace,
        lr=opt.lr,
        max_steps=100 * opt.epochs,
        seed=opt.seed,
        eval_interval=5,
    )
    trainer.load_checkpoint()
    if not opt.test:
        trainer.train(train_ds, valid_ds, max_epochs=opt.epochs)
    trainer.save_mesh(resolution=opt.mesh_resolution)


if __name__ == "__main__":
    main()

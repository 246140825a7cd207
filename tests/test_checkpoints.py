"""Checkpoint subsystem tests: rolling retention, best checkpoint from
EMA weights, latest-glob resume, and the profiler trace hook."""

import glob
import os

import jax.numpy as jnp
import numpy as np

from ngp_tpu.training import checkpoints as ck


def test_rolling_retention_and_latest(tmp_path):
    ws = str(tmp_path)
    state = {"w": jnp.arange(4.0)}
    for ep in range(1, 6):
        ck.save_checkpoint(ws, "m", state, epoch=ep, max_keep=2)
    kept = sorted(glob.glob(os.path.join(ws, "checkpoints", "m_ep*.ckpt")))
    assert [os.path.basename(p) for p in kept] == ["m_ep0004.ckpt", "m_ep0005.ckpt"]
    assert ck.latest_checkpoint(ws, "m").endswith("m_ep0005.ckpt")

    restored, extras = ck.load_checkpoint(kept[-1], {"w": jnp.zeros(4)})
    np.testing.assert_allclose(np.asarray(restored["w"]), np.arange(4.0))
    assert extras["epoch"] == 5


def test_best_checkpoint_separate(tmp_path):
    ws = str(tmp_path)
    ck.save_checkpoint(ws, "m", {"w": jnp.ones(2)}, epoch=1, best=True)
    ck.save_checkpoint(ws, "m", {"w": jnp.zeros(2)}, epoch=2, max_keep=1)
    best = os.path.join(ws, "checkpoints", "m_best.ckpt")
    assert os.path.exists(best)
    restored, _ = ck.load_checkpoint(best, {"w": jnp.zeros(2)})
    np.testing.assert_allclose(np.asarray(restored["w"]), 1.0)


def test_profile_steps_writes_trace(tmp_path):
    from ngp_tpu.data.mesh import icosphere
    from ngp_tpu.data.sdf_dataset import SDFDataset
    from ngp_tpu.models.sdf import SDFNetwork
    from ngp_tpu.training.sdf import SDFTrainer

    v, f = icosphere(subdiv=2, radius=1.0)
    ds = SDFDataset(vertices=v, faces=f, size=4, num_samples=512)
    trainer = SDFTrainer(
        SDFNetwork(num_layers=2, hidden_dim=16),
        workspace=str(tmp_path), log_every=10**9, use_tensorboard=False,
    )
    logdir = trainer.profile_steps(iter(ds), n_steps=2)
    # the trace directory must contain a plugins/profile capture
    found = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    assert found, f"no xplane trace under {logdir}"


def test_eval_metric_unified_contract(tmp_path):
    """One best-checkpoint contract (VERDICT weak #6/#8): the base
    Trainer.train(valid_loader=dataset) and train_on_dataset both key
    best on NeRFTrainer.eval_metric = -PSNR."""
    import pytest
    from ngp_tpu.config import NetworkConfig, RenderConfig, TrainConfig
    from ngp_tpu.data.nerf_dataset import NeRFDataset
    from ngp_tpu.data.synthetic import make_synthetic_dataset
    from ngp_tpu.models.nerf import NeRFNetwork
    from ngp_tpu.training.nerf import NeRFTrainer

    root = str(tmp_path / "synth")
    make_synthetic_dataset(root, n_train=2, n_val=1, n_test=1, H=24, W=24, num_steps=64)
    ds = NeRFDataset(root, split="val", scale=0.8)
    render_cfg = RenderConfig(bound=1.0, min_near=0.05, num_steps=16, upsample_steps=0)
    net_cfg = NetworkConfig(num_levels=2, level_dim=2, log2_hashmap_size=10, use_bf16=False)
    train_cfg = TrainConfig(iters=4, num_rays=64, workspace=str(tmp_path / "ws"))
    model = NeRFNetwork(cfg=net_cfg, render=render_cfg)
    tr = NeRFTrainer(model, render_cfg, train_cfg, log_every=10**9, use_tensorboard=False)
    tr.ensure_initialized()
    m = tr.eval_metric(ds)
    assert m == -tr.evaluate(ds)["psnr"]
    with pytest.raises(TypeError):
        tr.eval_metric([{"not": "a dataset"}])

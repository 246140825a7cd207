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

"""End-to-end SDF workload test (SURVEY.md §3.5 minimum slice):
train a small SDF net on a procedural sphere, check the loss drops,
checkpoint round-trips, and the extracted mesh matches the sphere."""

import numpy as np
import jax.numpy as jnp

from ngp_tpu.data.mesh import icosphere
from ngp_tpu.data.sdf_dataset import SDFDataset
from ngp_tpu.models.sdf import SDFNetwork
from ngp_tpu.training.sdf import SDFTrainer


def _make(tmp_path, seed=0):
    v, f = icosphere(subdiv=3, radius=1.0)
    ds = SDFDataset(vertices=v, faces=f, size=30, num_samples=8192, seed=seed)
    model = SDFNetwork(num_layers=3, hidden_dim=64)
    trainer = SDFTrainer(
        model,
        workspace=str(tmp_path),
        lr=5e-3,
        max_steps=300,
        log_every=1000,
        use_tensorboard=False,
    )
    return ds, trainer


def test_sdf_training_loss_drops_and_mesh(tmp_path):
    ds, trainer = _make(tmp_path)
    trainer.ensure_initialized()

    first = trainer.eval_step(trainer.state, trainer.aux, ds.sample_batch())
    trainer.train(ds, valid_loader=None, max_epochs=5)
    last = trainer.eval_step(trainer.state, trainer.aux, ds.sample_batch())
    assert float(last["loss"]) < 0.5 * float(first["loss"])

    # mesh export: vertices should lie near the normalized sphere
    path = trainer.save_mesh(resolution=64)
    from ngp_tpu.data.mesh import load_mesh

    verts, faces = load_mesh(path)
    assert len(verts) > 100 and len(faces) > 100
    r = np.linalg.norm(verts, axis=-1)
    # normalize_mesh scales diameter-2 sphere by 2/ (2*sqrt3) *0.95
    expect_r = 0.95 / np.sqrt(3)
    assert abs(np.median(r) - expect_r) < 0.1, (np.median(r), expect_r)


def test_sdf_checkpoint_roundtrip(tmp_path):
    ds, trainer = _make(tmp_path)
    trainer.train(ds, valid_loader=None, max_epochs=1)
    pred_before = trainer.predict_sdf(np.zeros((4, 3), np.float32))

    ds2, trainer2 = _make(tmp_path)
    assert trainer2.load_checkpoint()
    assert trainer2.epoch == 1
    pred_after = trainer2.predict_sdf(np.zeros((4, 3), np.float32))
    np.testing.assert_allclose(pred_before, pred_after, rtol=1e-6)

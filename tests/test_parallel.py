"""Multi-device (8 virtual CPU devices) data-parallel correctness.

Verifies what the reference's DDP plumbing promises (SURVEY.md §2.3,
nerf/utils.py:363-367, 944-965): sharded-ray training is numerically
the single-device computation, frame rendering works under a mesh, and
eval metric aggregation via psum/all_gather matches host math.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ngp_tpu.config import NetworkConfig, RenderConfig, TrainConfig
from ngp_tpu.models.nerf import NeRFNetwork
from ngp_tpu.parallel import (
    eval_metrics_dp,
    gather_predictions_dp,
    make_mesh,
    replicate_sharding,
    shard_pytree,
)
from ngp_tpu.training.nerf_grid import GridNeRFTrainer


def _tiny_trainer(workspace, mesh=None):
    render_cfg = RenderConfig(
        bound=1.0, min_near=0.05, dt_gamma=0.0, max_steps=32,
        max_samples_per_ray=16, grid_size=16,
    )
    net_cfg = NetworkConfig(
        num_levels=4, level_dim=2, log2_hashmap_size=12, use_bf16=False
    )
    train_cfg = TrainConfig(iters=100, num_rays=64, workspace=str(workspace))
    model = NeRFNetwork(cfg=net_cfg, render=render_cfg)
    trainer = GridNeRFTrainer(
        model, render_cfg, train_cfg, log_every=10**9, use_tensorboard=False
    )
    trainer.mesh = mesh
    trainer.ensure_initialized()
    return trainer


def _tiny_batch(H=16, W=16, n_frames=2):
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(size=(n_frames, H, W, 4)).astype(np.float32))
    poses = []
    for _ in range(n_frames):
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = [0, 0, -2.0]
        poses.append(pose)
    return {
        "images": images,
        "poses": jnp.asarray(np.stack(poses)),
        "intrinsics": jnp.asarray([20.0, 20.0, W / 2, H / 2], dtype=jnp.float32),
        "idx": jnp.int32(0),
    }


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


def test_sharded_train_step_matches_single_device(tmp_path, mesh):
    """8-way DP step == single-device step on identical inputs
    (nerf/utils.py:363-367 DDP-equivalence; grads all-reduced by XLA)."""
    batch = _tiny_batch()
    rng = jax.random.PRNGKey(7)

    t1 = _tiny_trainer(tmp_path / "a", mesh=None)
    s1, a1, m1 = jax.jit(t1.train_step)(t1.state, t1.aux, batch, rng)

    t8 = _tiny_trainer(tmp_path / "b", mesh=mesh)
    repl = replicate_sharding(mesh)
    t8.state = shard_pytree(t8.state, repl)
    t8.aux = shard_pytree(t8.aux, repl)
    sharded_batch = shard_pytree(batch, repl)
    with mesh:
        s8, a8, m8 = jax.jit(t8.train_step)(t8.state, t8.aux, sharded_batch, rng)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    flat1 = jax.tree.leaves(s1.params)
    flat8 = jax.tree.leaves(s8.params)
    for x, y in zip(flat1, flat8):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=2e-4, atol=2e-6
        )


def test_render_frame_under_mesh(tmp_path, mesh):
    """Full-frame staged rendering with rays sharded over the mesh."""
    trainer = _tiny_trainer(tmp_path, mesh=mesh)
    repl = replicate_sharding(mesh)
    trainer.state = shard_pytree(trainer.state, repl)
    trainer.aux = shard_pytree(trainer.aux, repl)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0, 0, -2.0]
    intr = np.array([20.0, 20.0, 8.0, 8.0], np.float32)
    with mesh:
        img, depth = trainer.render_frame(pose, intr, 16, 16, chunk=64)
    assert img.shape == (16, 16, 3)
    assert depth.shape == (16, 16)
    assert np.isfinite(img).all() and np.isfinite(depth).all()


def test_eval_metrics_dp_matches_host(mesh):
    """psum-aggregated MSE/PSNR == plain numpy over the full arrays
    (dist.all_reduce equivalent, nerf/utils.py:944-951)."""
    rng = np.random.default_rng(3)
    pred = rng.uniform(size=(64, 3)).astype(np.float32)
    gt = rng.uniform(size=(64, 3)).astype(np.float32)
    out = eval_metrics_dp(mesh, jnp.asarray(pred), jnp.asarray(gt))
    mse_host = np.mean((pred - gt) ** 2)
    np.testing.assert_allclose(float(out["mse"]), mse_host, rtol=1e-6)
    np.testing.assert_allclose(
        float(out["psnr"]), -10.0 * np.log10(mse_host), rtol=1e-5
    )


def test_gather_predictions_dp(mesh):
    """all_gather of sharded predictions == the original array
    (dist.all_gather equivalent, nerf/utils.py:952-965)."""
    x = np.arange(64 * 5, dtype=np.float32).reshape(64, 5)
    out = gather_predictions_dp(mesh, jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(out), x)


def test_tensor_parallel_cp_factor_sharding(tmp_path):
    """2-axis (data x model) mesh: CP factor banks shard rank-wise over
    'model' (with their Adam moments), the full train step runs, the
    layout survives the update, and the loss matches the replicated
    run."""
    from ngp_tpu.parallel.mesh import tp_param_specs

    render_cfg = RenderConfig(
        bound=1.0, min_near=0.05, dt_gamma=0.0, max_steps=32,
        max_samples_per_ray=16, grid_size=16,
        turbo=True, coarse_candidates=32, crossing_slots=16,
        compact_mean_samples=8,
    )
    net_cfg = NetworkConfig(
        encoding="cpgrid", use_bf16=False,
        cp_resolutions=(32, 64), cp_rank=8, cp_freq_degree=4,
    )
    train_cfg = TrainConfig(iters=100, num_rays=64, workspace=str(tmp_path))
    model = NeRFNetwork(cfg=net_cfg, render=render_cfg)

    def run(mesh, tp):
        trainer = GridNeRFTrainer(
            model, render_cfg, train_cfg, log_every=10**9, use_tensorboard=False
        )
        trainer.mesh = mesh
        trainer.ensure_initialized()
        batch = _tiny_batch()
        if mesh is not None:
            if tp:
                specs = tp_param_specs(trainer.state, mesh)
                trainer.state = jax.tree.map(jax.device_put, trainer.state, specs)
            else:
                repl = replicate_sharding(mesh)
                trainer.state = shard_pytree(trainer.state, repl)
            trainer.aux = shard_pytree(trainer.aux, replicate_sharding(mesh))
            batch = shard_pytree(batch, replicate_sharding(mesh))
            with mesh:
                step = jax.jit(trainer.train_step)
                state, aux, metrics = step(
                    trainer.state, trainer.aux, batch, jax.random.PRNGKey(0)
                )
        else:
            state, aux, metrics = jax.jit(trainer.train_step)(
                trainer.state, trainer.aux, batch, jax.random.PRNGKey(0)
            )
        return state, float(metrics["loss"])

    mesh = make_mesh(8, model_parallel=2)
    assert mesh.devices.shape == (4, 2)
    state_tp, loss_tp = run(mesh, tp=True)
    _, loss_single = run(None, tp=False)
    assert loss_tp == pytest.approx(loss_single, rel=1e-4)
    # factor leaves kept their model-axis sharding through the update
    leaves = jax.tree_util.tree_leaves_with_path(state_tp.params)
    facs = [l for p, l in leaves
            if "factors_" in "/".join(str(getattr(q, "key", q)) for q in p)]
    assert facs and all(not f.sharding.is_fully_replicated for f in facs)

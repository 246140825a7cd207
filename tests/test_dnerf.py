"""D-NeRF tests: deformation/basis network shapes, time-sliced
occupancy, and a short e2e training run on a dynamic synthetic scene."""

import numpy as np
import jax
import jax.numpy as jnp

from ngp_tpu.config import NetworkConfig, RenderConfig, TrainConfig
from ngp_tpu.models.dnerf import DNeRFBasisNetwork, DNeRFNetwork
from ngp_tpu.training.dnerf import (
    DNeRFTrainer,
    init_time_occupancy,
    slice_at_time,
)


def _cfgs(**render_kw):
    kw = dict(
        bound=1.0, min_near=0.05, dt_gamma=0.0, max_steps=128,
        max_samples_per_ray=64, grid_size=16, time_size=8,
        density_thresh=10.0,
    )
    kw.update(render_kw)
    render_cfg = RenderConfig(**kw)
    net_cfg = NetworkConfig(num_levels=4, level_dim=2, log2_hashmap_size=12, use_bf16=False)
    return net_cfg, render_cfg


def test_dnerf_network_shapes():
    net_cfg, render_cfg = _cfgs()
    model = DNeRFNetwork(cfg=net_cfg, render=render_cfg, num_layers_deform=2, hidden_dim_deform=32)
    x = jnp.zeros((16, 3))
    d = jnp.concatenate([jnp.ones((16, 1)), jnp.zeros((16, 2))], -1)
    params = model.init(jax.random.PRNGKey(0), x, d, 0.5, method=DNeRFNetwork.full_init)
    sigma, rgb, deform = model.apply(params, x, d, 0.5)
    assert sigma.shape == (16,) and rgb.shape == (16, 3) and deform.shape == (16, 3)
    # time dependence: different t must change deformation
    _, _, deform2 = model.apply(params, x, d, 0.9)
    assert np.abs(np.asarray(deform) - np.asarray(deform2)).max() > 0


def test_dnerf_basis_network_shapes():
    net_cfg, render_cfg = _cfgs()
    model = DNeRFBasisNetwork(cfg=net_cfg, render=render_cfg, num_basis=3)
    x = jnp.zeros((8, 3))
    d = jnp.concatenate([jnp.ones((8, 1)), jnp.zeros((8, 2))], -1)
    params = model.init(jax.random.PRNGKey(0), x, d, 0.5, method=DNeRFBasisNetwork.full_init)
    sigma, rgb, _ = model.apply(params, x, d, 0.3)
    assert sigma.shape == (8,) and rgb.shape == (8, 3)
    s2, _, _ = model.apply(params, x, d, 0.9)
    assert np.abs(np.asarray(sigma) - np.asarray(s2)).max() > 0


def test_time_occupancy_slicing():
    _, render_cfg = _cfgs()
    state = init_time_occupancy(render_cfg)
    assert state.density_grid.shape == (8, 1, 16, 16, 16)
    # mark slice 3 distinctly and check slicing picks it
    g = state.density_grid.at[3].set(7.0)
    state = state.replace(density_grid=g)
    # time in [3/8, 4/8) maps to slice 3
    sl = slice_at_time(state, jnp.float32(0.45), render_cfg)
    assert float(sl.density_grid.max()) == 7.0
    sl = slice_at_time(state, jnp.float32(0.1), render_cfg)
    assert float(sl.density_grid.max()) == 0.0


def test_dnerf_trainer_e2e(tmp_path):
    from ngp_tpu.data.nerf_dataset import NeRFDataset
    from ngp_tpu.data.synthetic import make_synthetic_dataset

    root = str(tmp_path / "dsynth")
    make_synthetic_dataset(
        root, n_train=6, n_val=2, n_test=1, H=48, W=48, num_steps=192, dynamic=True
    )
    train_ds = NeRFDataset(root, split="train", scale=0.8)
    assert train_ds.times.shape == (6,)
    assert train_ds.times.max() <= 1.0 and train_ds.times.min() >= 0.0

    net_cfg, render_cfg = _cfgs()
    train_cfg = TrainConfig(
        iters=200, lr=1e-2, num_rays=1024, workspace=str(tmp_path / "ws"),
        update_extra_interval=16,
    )
    model = DNeRFNetwork(
        cfg=net_cfg, render=render_cfg, num_layers_deform=2, hidden_dim_deform=32
    )
    trainer = DNeRFTrainer(
        model, render_cfg, train_cfg, log_every=10**9, use_tensorboard=False
    )
    trainer.ensure_initialized()
    before = trainer.evaluate(train_ds, max_frames=1)["psnr"]
    trainer.train_on_dataset(train_ds, valid_ds=None, max_epochs=25)  # 150 steps
    after = trainer.evaluate(train_ds, max_frames=1)["psnr"]
    print(f"dnerf PSNR: {before:.2f} -> {after:.2f}")
    assert after > before + 4.0


def test_dnerf_hyper_network_shapes():
    from ngp_tpu.models.dnerf import DNeRFHyperNetwork

    net_cfg, render_cfg = _cfgs()
    model = DNeRFHyperNetwork(
        cfg=net_cfg, render=render_cfg, num_layers_ambient=2,
        hidden_dim_ambient=32, ambient_dim=1,
    )
    x = jnp.zeros((8, 3))
    d = jnp.concatenate([jnp.ones((8, 1)), jnp.zeros((8, 2))], -1)
    params = model.init(jax.random.PRNGKey(0), x, d, 0.5, method=DNeRFHyperNetwork.full_init)
    sigma, rgb, _ = model.apply(params, x, d, 0.2)
    assert sigma.shape == (8,) and rgb.shape == (8, 3)
    s2, _, _ = model.apply(params, x, d, 0.8)
    assert np.abs(np.asarray(sigma) - np.asarray(s2)).max() > 0


def test_dnerf_turbo_payload_slice_matches_pack():
    """Time-sliced turbo payloads: slice_at_time must hand the march
    exactly pack_occupancy_payloads(occ_grid[t]) (the CUDA kernel's
    bitfield[floor(time*T)] indexing, dnerf/renderer.py:283-285)."""
    from ngp_tpu.models.occupancy import pack_occupancy_payloads

    _, render_cfg = _cfgs(turbo=True, max_samples_per_ray=16,
                          coarse_candidates=32, crossing_slots=8,
                          compact_mean_samples=4)
    state = init_time_occupancy(render_cfg)
    assert state.coarse_payload is not None
    # give slice 5 a distinct sparse pattern
    rng = np.random.default_rng(0)
    og = np.array(state.occ_grid)
    og[5] = rng.random(og[5].shape) < 0.2
    state = state.replace(occ_grid=jnp.asarray(og))
    # re-stack payloads the way the refresh does (per-slice pack)
    cps, fps = jax.lax.map(pack_occupancy_payloads, state.occ_grid)
    state = state.replace(coarse_payload=cps, fine_payload=fps)
    sl = slice_at_time(state, jnp.float32(5.5 / 8.0), render_cfg)
    cp_ref, fp_ref = pack_occupancy_payloads(state.occ_grid[5])
    np.testing.assert_array_equal(np.asarray(sl.coarse_payload), np.asarray(cp_ref))
    np.testing.assert_array_equal(np.asarray(sl.fine_payload), np.asarray(fp_ref))


def test_dnerf_trainer_e2e_turbo(tmp_path):
    """D-NeRF through the TURBO march: time-sliced packed payloads +
    compact-batch deform regularisation. Same scene/assertions as the
    v1 e2e."""
    from ngp_tpu.data.nerf_dataset import NeRFDataset
    from ngp_tpu.data.synthetic import make_synthetic_dataset

    root = str(tmp_path / "dsynth")
    make_synthetic_dataset(
        root, n_train=6, n_val=2, n_test=1, H=48, W=48, num_steps=192, dynamic=True
    )
    train_ds = NeRFDataset(root, split="train", scale=0.8)

    net_cfg, render_cfg = _cfgs(
        turbo=True, max_steps=64, max_samples_per_ray=16,
        coarse_candidates=48, crossing_slots=16, compact_mean_samples=8,
    )
    train_cfg = TrainConfig(
        iters=200, lr=1e-2, num_rays=1024, workspace=str(tmp_path / "ws"),
        update_extra_interval=16,
    )
    model = DNeRFNetwork(
        cfg=net_cfg, render=render_cfg, num_layers_deform=2, hidden_dim_deform=32
    )
    trainer = DNeRFTrainer(
        model, render_cfg, train_cfg, log_every=10**9, use_tensorboard=False
    )
    trainer.ensure_initialized()
    # no-drop eval budget: at 150 steps the grid is still dense, and
    # the scarce default water-fill budget (tuned for converged
    # 800x800 scenes) would measure the budget policy, not the training
    trainer.eval_mean_samples = None
    before = trainer.evaluate(train_ds, max_frames=1)["psnr"]
    trainer.train_on_dataset(train_ds, valid_ds=None, max_epochs=25)  # 150 steps
    after = trainer.evaluate(train_ds, max_frames=1)["psnr"]
    print(f"dnerf-turbo PSNR: {before:.2f} -> {after:.2f}")
    assert after > before + 4.0


def test_dnerf_refresh_phases(tmp_path):
    """Grid-refresh phases (dnerf/renderer.py:465-528): full sweeps for
    the first 16 refreshes, then a ROTATING quarter of the time slices
    per refresh (the TPU partial: payload re-packing dominates per-
    slice cost, so slice count is the budget lever), frozen at 100."""
    net_cfg, render_cfg = _cfgs(
        turbo=True, max_steps=32, max_samples_per_ray=8,
        coarse_candidates=16, crossing_slots=8,
    )
    train_cfg = TrainConfig(
        iters=10, lr=1e-2, num_rays=64, workspace=str(tmp_path / "ws")
    )
    model = DNeRFNetwork(
        cfg=net_cfg, render=render_cfg, num_layers_deform=2,
        hidden_dim_deform=32,
    )
    trainer = DNeRFTrainer(
        model, render_cfg, train_cfg, log_every=10**9, use_tensorboard=False
    )
    trainer.ensure_initialized()
    trainer.refresh_time_chunk = 2  # T=8 -> partial = 2 rotating slices
    T = render_cfg.time_size

    def grid():
        return np.asarray(trainer.aux["occ"].density_grid)

    # full phase: every slice changes
    g0 = grid()
    trainer._update_occupancy()
    g1 = grid()
    changed = [bool(np.any(g1[t] != g0[t])) for t in range(T)]
    assert all(changed), changed
    assert int(trainer.aux["occ"].iter_density) == 1

    # partial phase: exactly the rotating quarter changes
    trainer.aux["occ"] = trainer.aux["occ"].replace(
        iter_density=jnp.int32(20)
    )
    for expect in ([0, 1], [2, 3], [4, 5], [6, 7], [0, 1]):
        before = grid()
        trainer._update_occupancy()
        after = grid()
        changed = [bool(np.any(after[t] != before[t])) for t in range(T)]
        untouched = [t for t in range(T) if t not in expect]
        assert all(not changed[t] for t in untouched), (expect, changed)
        assert any(changed[t] for t in expect), (expect, changed)

    # frozen after 100 refreshes (renderer.py:500)
    trainer.aux["occ"] = trainer.aux["occ"].replace(
        iter_density=jnp.int32(100)
    )
    before = grid()
    trainer._update_occupancy()
    np.testing.assert_array_equal(grid(), before)


def test_dnerf_shared_eval_stack_parity(tmp_path):
    """Round 4: D-NeRF evaluates through the SHARED staged frame
    renderer (time as a traced argument — the reference's dnerf Trainer
    inherits nerf/utils.py:316 the same way). Parity: render_frame via
    the shared stack == a direct render_batch over the frame's rays at
    the same time (up to the u8 transfer quantization), and two
    different times give different frames (the time argument is live).
    Also: evaluate() now reports SSIM for D-NeRF."""
    from ngp_tpu.data.nerf_dataset import NeRFDataset
    from ngp_tpu.data.raysampler import full_frame_rays_np
    from ngp_tpu.data.synthetic import make_synthetic_dataset

    root = str(tmp_path / "dsynth")
    make_synthetic_dataset(
        root, n_train=4, n_val=2, n_test=1, H=32, W=32, num_steps=128,
        dynamic=True,
    )
    train_ds = NeRFDataset(root, split="train", scale=0.8)
    net_cfg, render_cfg = _cfgs(
        turbo=True, max_steps=64, max_samples_per_ray=16,
        coarse_candidates=48, crossing_slots=16, compact_mean_samples=8,
    )
    train_cfg = TrainConfig(
        iters=50, lr=1e-2, num_rays=512, workspace=str(tmp_path / "ws"),
    )
    model = DNeRFNetwork(
        cfg=net_cfg, render=render_cfg, num_layers_deform=2,
        hidden_dim_deform=16,
    )
    trainer = DNeRFTrainer(
        model, render_cfg, train_cfg, log_every=10**9, use_tensorboard=False
    )
    trainer.ensure_initialized()
    trainer.train_on_dataset(train_ds, valid_ds=None, max_epochs=8)

    H = W = 32
    pose = np.asarray(train_ds.poses[0], np.float32)
    t0 = float(train_ds.times[0])
    trainer.eval_mean_samples = None  # no-drop; isolate path parity
    trainer.eval_prepass = False  # strict parity: same lattice phase
    img, _ = trainer.render_frame(pose, train_ds.intrinsics, H, W, time=t0)

    # direct reference: render_batch over the full frame's rays
    rays = full_frame_rays_np(pose, train_ds.intrinsics, H, W)
    out = trainer.render_batch(
        trainer.eval_params(), jnp.asarray(rays["rays_o"]),
        jnp.asarray(rays["rays_d"]), bg_color=jnp.float32(1.0),
        aux=trainer.aux, time=jnp.float32(t0),
    )
    ref = np.asarray(out["image"], np.float32).reshape(H, W, 3)
    # u8 transfer quantization = 1/255 per channel max
    assert np.max(np.abs(img - ref)) <= (0.5 / 255) + 1e-3

    img_t1, _ = trainer.render_frame(
        pose, train_ds.intrinsics, H, W, time=float(train_ds.times[-1])
    )
    assert np.mean(np.abs(img_t1 - img)) > 1e-4  # time is live

    # the time-sliced eval prepass culls without changing the frame
    # beyond the per-ray lattice phase shift
    trainer.eval_prepass = True
    img_pp, _ = trainer.render_frame(pose, train_ds.intrinsics, H, W, time=t0)
    assert float(np.mean((img_pp - img) ** 2)) < 1e-4

    res = trainer.evaluate(train_ds, max_frames=2, with_ssim=True)
    assert np.isfinite(res["psnr"]) and "ssim" in res

"""Eval-cull prepass (occupancy.ray_prepass): conservative hit/t-range
guarantees and the trainer's two-round frame rendering path.

The prepass is the TPU answer to the reference's alive-ray inference
loop (nerf/renderer.py:336-367 + raymarching.cu:700-914): one cheap
dilated-coarse pass decides which rays can produce samples at all and
brackets each hit ray's sample interval. The contract tested here is
the safety property the cull rests on: NO FALSE NEGATIVES — every ray
the full march gives >= 1 valid sample must be prepass-hit, and every
valid sample t must lie inside the ray's [t0, t1]."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ngp_tpu.config import RenderConfig
from ngp_tpu.models.occupancy import (
    init_occupancy,
    march_rays,
    march_rays_turbo,
    pack_occupancy_payloads,
    pack_prepass_payload,
    prepass_probes,
    ray_prepass,
)


def _cfg(**kw):
    kw.setdefault("bound", 1.0)
    kw.setdefault("min_near", 0.05)
    kw.setdefault("dt_gamma", 0.0)
    kw.setdefault("max_steps", 64)
    kw.setdefault("max_samples_per_ray", 16)
    kw.setdefault("grid_size", 16)
    kw.setdefault("turbo", True)
    kw.setdefault("coarse_candidates", 64)
    kw.setdefault("crossing_slots", 64)
    kw.setdefault("compact_mean_samples", 16)
    return RenderConfig(**kw)


def _rays(n=128, seed=0, bound=1.0):
    rng = np.random.default_rng(seed)
    ro = np.tile(np.array([[0.0, 0.0, -2.0 * bound]], np.float32), (n, 1))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] = np.abs(d[:, 2]) + 0.5
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(ro), jnp.asarray(d)


def _state(cfg, seed=1, frac=0.1):
    rng = np.random.default_rng(seed)
    state = init_occupancy(cfg)
    occ = jnp.asarray(
        rng.random((cfg.cascades,) + (cfg.grid_size,) * 3) < frac
    )
    cp, fp = pack_occupancy_payloads(occ)
    return state.replace(
        occ_grid=occ, coarse_payload=cp, fine_payload=fp,
        prepass_payload=pack_prepass_payload(occ),
    )


@pytest.mark.parametrize("dt_gamma,bound", [(0.0, 1.0), (1 / 128, 2.0)])
@pytest.mark.parametrize("frac", [0.02, 0.15])
def test_prepass_no_false_negatives(dt_gamma, bound, frac):
    """Every ray with a valid full-march sample is hit, and every valid
    sample t lies in the prepass [t0, t1] — for uniform and adaptive
    lattices, sparse and denser occupancy, 1 and 2 cascades."""
    cfg = _cfg(dt_gamma=dt_gamma, bound=bound)
    state = _state(cfg, frac=frac)
    ro, rd = _rays(bound=bound)
    pre = ray_prepass(ro, rd, state, cfg)
    m = march_rays(ro, rd, state, cfg)
    has = np.asarray(jnp.any(m["mask"], axis=1))
    hit = np.asarray(pre["hit"])
    assert not np.any(has & ~hit), "prepass missed a sampling ray"
    ts = np.asarray(m["ts"])
    msk = np.asarray(m["mask"])
    t0 = np.asarray(pre["t0"])[:, None]
    t1 = np.asarray(pre["t1"])[:, None]
    assert np.all(~msk | ((ts >= t0 - 1e-5) & (ts <= t1 + 1e-5)))


def test_prepass_t_range_march_equivalence():
    """Marching with t_range = the prepass interval reproduces the
    unrestricted march's samples bit-exactly when t0 == near (no
    lattice phase change): the clip only removes probes that never
    produced samples."""
    cfg = _cfg()
    state = _state(cfg, frac=0.08)
    ro, rd = _rays(n=64)
    pre = ray_prepass(ro, rd, state, cfg)
    m_full = march_rays_turbo(ro, rd, state, cfg)
    # t_range with near untouched (t0 = 0 keeps the lattice phase) and
    # far clipped to the prepass's t1: identical samples
    tr = jnp.stack([jnp.zeros_like(pre["t0"]), pre["t1"]], axis=-1)
    m_clip = march_rays_turbo(ro, rd, state, cfg, t_range=tr)
    np.testing.assert_array_equal(
        np.asarray(m_full["mask"]), np.asarray(m_clip["mask"])
    )
    np.testing.assert_allclose(
        np.asarray(m_full["ts"]), np.asarray(m_clip["ts"]), rtol=0, atol=0
    )


def test_prepass_miss_rays_march_empty():
    """Rays the prepass rejects produce no samples in the full march —
    culling them renders exactly the background."""
    cfg = _cfg()
    state = _state(cfg, frac=0.05)
    ro, rd = _rays(n=256, seed=3)
    pre = ray_prepass(ro, rd, state, cfg)
    m = march_rays_turbo(ro, rd, state, cfg)
    n_samples = np.asarray(jnp.sum(m["mask"], axis=1))
    assert np.all(n_samples[~np.asarray(pre["hit"])] == 0)


def test_prepass_probe_count_static():
    cfg = _cfg()
    assert prepass_probes(cfg) >= 2
    import dataclasses

    small = dataclasses.replace(cfg, lattice_span=0.5)
    assert prepass_probes(small) < prepass_probes(cfg)


def test_trainer_prepass_frame_parity():
    """GridNeRFTrainer.render_frames with the prepass on matches the
    no-prepass frame: bit-identical where the lattice phase is
    unchanged is not guaranteed (per-ray nears shift the lattice), so
    assert a tight PSNR bound instead + exact background on misses."""
    from ngp_tpu.config import NetworkConfig, TrainConfig
    from ngp_tpu.models.nerf import NeRFNetwork
    from ngp_tpu.training.nerf_grid import GridNeRFTrainer

    render_cfg = _cfg(grid_size=16, max_steps=64, max_samples_per_ray=16)
    net_cfg = NetworkConfig(
        encoding="frequency", use_bf16=False, num_layers=1, hidden_dim=16,
        num_layers_color=1, hidden_dim_color=16,
    )
    train_cfg = TrainConfig(iters=10, num_rays=256, workspace="/tmp/pp_ws")
    model = NeRFNetwork(cfg=net_cfg, render=render_cfg)
    tr = GridNeRFTrainer(model, render_cfg, train_cfg, log_every=10**9,
                         use_tensorboard=False)
    tr.ensure_initialized()
    # sparse random grid so the cull has real work
    state = _state(render_cfg, frac=0.06)
    tr.aux = {"occ": state}
    tr.eval_mean_samples = None  # no-drop: isolate the prepass effect
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = -2.0
    intr = np.array([40.0, 40.0, 16.0, 16.0], np.float32)
    H = W = 32

    tr.eval_prepass = False
    img_off, _ = tr.render_frame(pose, intr, H, W, chunk=256)
    tr.eval_prepass = True
    img_on, _ = tr.render_frame(pose, intr, H, W, chunk=256)
    # the per-ray near shift can move samples by < one dt; images stay
    # extremely close, and culled rays are exactly background
    mse = float(np.mean((img_on - img_off) ** 2))
    assert mse < 1e-4, mse

    # direct (no-compaction) render at an ample static cap: same frame
    tr.eval_direct = True
    tr.eval_direct_cap = render_cfg.max_samples_per_ray
    img_d, _ = tr.render_frame(pose, intr, H, W, chunk=256)
    mse_d = float(np.mean((img_d - img_on) ** 2))
    assert mse_d < 1e-6, mse_d
    tr.eval_direct = False


def test_trainer_prepass_with_background_net():
    """bg_radius > 0 keeps the eval cull (round-4 VERDICT weak #4):
    prepass misses render through the march-free bg-net pass
    (_render_bg_frames) and the frame matches the no-cull render —
    the reference composites bg for dead rays the same way
    (nerf/renderer.py:271-274, :316)."""
    from ngp_tpu.config import NetworkConfig, TrainConfig
    from ngp_tpu.models.nerf import NeRFNetwork
    from ngp_tpu.training.nerf_grid import GridNeRFTrainer

    render_cfg = _cfg(grid_size=16, max_steps=64, max_samples_per_ray=16,
                      bg_radius=32.0)
    net_cfg = NetworkConfig(
        encoding="frequency", use_bf16=False, num_layers=1, hidden_dim=16,
        num_layers_color=1, hidden_dim_color=16,
    )
    train_cfg = TrainConfig(iters=10, num_rays=256, workspace="/tmp/ppbg_ws")
    model = NeRFNetwork(cfg=net_cfg, render=render_cfg)
    tr = GridNeRFTrainer(model, render_cfg, train_cfg, log_every=10**9,
                         use_tensorboard=False)
    tr.ensure_initialized()
    state = _state(render_cfg, frac=0.06)
    tr.aux = {"occ": state}
    tr.eval_mean_samples = None  # no-drop: isolate the cull effect
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = -2.0
    intr = np.array([40.0, 40.0, 16.0, 16.0], np.float32)
    H = W = 32

    tr.eval_prepass = False
    img_off, _ = tr.render_frame(pose, intr, H, W, chunk=256)
    tr.eval_prepass = True
    img_on, _ = tr.render_frame(pose, intr, H, W, chunk=256)
    # culled rays must show the BG NET's color, not flat white: with a
    # random-init bg net the frame can't be all-ones
    assert float(np.abs(img_on - 1.0).max()) > 1e-3
    mse = float(np.mean((img_on - img_off) ** 2))
    assert mse < 1e-4, mse

    # prepass misses exactly match the bg-only pass
    pre = tr._run_eval_prepass(pose[None], intr, H, W,
                               np.asarray(render_cfg.aabb, np.float32))
    assert pre is not None
    hit = np.zeros(H * W, bool)
    cnt = pre["count"]
    hit[np.asarray(pre["sorted_inds"])[:cnt]] = True
    bg = tr._render_bg_frames(
        tr.eval_params(), pose[None].astype(np.float32), intr, H, W
    )[0].reshape(H, W, 3)
    miss = ~hit.reshape(H, W)
    np.testing.assert_allclose(
        img_on[miss], bg[miss], atol=1e-6
    )


def test_t_proxy_culling():
    """Transmittance-proxy early-out (march_rays_turbo via
    cfg.t_proxy_thresh): candidates behind an estimated-opaque prefix
    are culled. With the proxy effectively disabled (threshold ~0) the
    march is bit-identical; with a realistic threshold on an opaque
    slab the per-ray sample count drops and the composited image
    changes by at most ~thresh (the culled samples' true weights are
    bounded by the estimated transmittance when the grid density is
    exact, as here)."""
    import dataclasses

    from ngp_tpu.models.occupancy import composite_rays

    cfg = _cfg(bound=1.0, max_steps=64, max_samples_per_ray=32,
               grid_size=16)
    SIGMA = 60.0  # opaque: T crosses 1e-4 after ~0.15 world units
    state = init_occupancy(cfg)
    occ = np.zeros((1, 16, 16, 16), bool)
    occ[0, :, :, 6:14] = True  # thick z-slab
    dens = np.where(occ, SIGMA, 0.0).astype(np.float32)
    occ_j = jnp.asarray(occ)
    dens_j = jnp.asarray(dens)
    cp, fp = pack_occupancy_payloads(occ_j, dens_j)
    state = state.replace(
        occ_grid=occ_j, coarse_payload=cp, fine_payload=fp,
        density_grid=dens_j, prepass_payload=pack_prepass_payload(occ_j),
    )
    ro, rd = _rays(n=64, seed=5)

    m_off = march_rays_turbo(ro, rd, state, cfg)
    tiny = dataclasses.replace(cfg, t_proxy_thresh=1e-30)
    m_tiny = march_rays_turbo(ro, rd, state, tiny)
    np.testing.assert_array_equal(
        np.asarray(m_off["mask"]), np.asarray(m_tiny["mask"])
    )
    np.testing.assert_array_equal(
        np.asarray(m_off["ts"]), np.asarray(m_tiny["ts"])
    )

    thresh = 1e-4
    on = dataclasses.replace(cfg, t_proxy_thresh=thresh)
    m_on = march_rays_turbo(ro, rd, state, on)
    n_off = np.asarray(jnp.sum(m_off["mask"], axis=1))
    n_on = np.asarray(jnp.sum(m_on["mask"], axis=1))
    assert n_on.sum() < 0.7 * n_off.sum(), (n_on.sum(), n_off.sum())
    assert np.all(n_on[n_off > 0] > 0)  # surfaces keep their front

    def render(m):
        sig = jnp.where(
            jnp.max(jnp.abs(m["xyzs"][..., 2:]), axis=-1) < 2.0, SIGMA, SIGMA
        )  # uniform sigma inside samples (all samples are in the slab)
        rgb = jnp.ones(m["xyzs"].shape[:2] + (3,)) * 0.5
        out = composite_rays(
            sig, rgb, m["ts"], m["deltas"], m["mask"], m["nears"],
            m["fars"], t_thresh=1e-6,
        )
        return np.asarray(out["image"])

    img_off, img_on = render(m_off), render(m_on)
    assert np.max(np.abs(img_off - img_on)) < 50 * thresh


def test_t_proxy_thin_sheet_no_phantom_cull():
    """Erosion regression (the round-4 PSNR 35->15 bug): the grid
    stores EMA-MAX point samples, so every BOUNDARY cell of an object
    reads fully dense — a ray crossing (or grazing) a one-cell-thick
    dense sheet would accumulate huge phantom optical depth and cull
    real content behind it. pack_occupancy_payloads erodes (3^3
    min-pool) the density before quantizing, so a sheet with no
    interior contributes ZERO proxy depth: the march with the proxy on
    must be bit-identical to proxy-off."""
    import dataclasses

    cfg = _cfg(bound=1.0, max_steps=64, max_samples_per_ray=32,
               grid_size=16)
    state = init_occupancy(cfg)
    occ = np.zeros((1, 16, 16, 16), bool)
    occ[0, :, :, 5] = True      # one-cell-thick dense sheet
    occ[0, :, :, 10:12] = True  # real content behind it
    dens = np.zeros((1, 16, 16, 16), np.float32)
    dens[0, :, :, 5] = 1000.0   # raw codes would cull everything behind
    dens[0, :, :, 10:12] = 5.0
    occ_j, dens_j = jnp.asarray(occ), jnp.asarray(dens)
    cp, fp = pack_occupancy_payloads(occ_j, dens_j)
    state = state.replace(
        occ_grid=occ_j, coarse_payload=cp, fine_payload=fp,
        density_grid=dens_j, prepass_payload=pack_prepass_payload(occ_j),
    )
    ro, rd = _rays(n=64, seed=7)

    m_off = march_rays_turbo(ro, rd, state, cfg)
    on = dataclasses.replace(cfg, t_proxy_thresh=1e-4)
    m_on = march_rays_turbo(ro, rd, state, on)
    np.testing.assert_array_equal(
        np.asarray(m_off["mask"]), np.asarray(m_on["mask"])
    )
    np.testing.assert_array_equal(
        np.asarray(m_off["ts"]), np.asarray(m_on["ts"])
    )
    # sanity: rays do reach the content behind the sheet
    n_samples = np.asarray(jnp.sum(m_off["mask"], axis=1))
    assert n_samples.max() > 4


def test_eval_f32_frames_unquantized():
    """eval_f32_frames=True returns frames WITHOUT the u8 transfer
    quantization: the u8 frame is within half a step (1/510) of the f32
    frame, and the f32 frame actually carries sub-step detail (values
    off the u8 lattice)."""
    from ngp_tpu.config import NetworkConfig, TrainConfig
    from ngp_tpu.models.nerf import NeRFNetwork
    from ngp_tpu.training.nerf_grid import GridNeRFTrainer

    render_cfg = _cfg(grid_size=16, max_steps=64, max_samples_per_ray=16)
    net_cfg = NetworkConfig(
        encoding="frequency", use_bf16=False, num_layers=1, hidden_dim=16,
        num_layers_color=1, hidden_dim_color=16,
    )
    train_cfg = TrainConfig(iters=10, num_rays=256, workspace="/tmp/pp_ws")
    model = NeRFNetwork(cfg=net_cfg, render=render_cfg)
    tr = GridNeRFTrainer(model, render_cfg, train_cfg, log_every=10**9,
                         use_tensorboard=False)
    tr.ensure_initialized()
    state = _state(render_cfg, frac=0.06)
    tr.aux = {"occ": state}
    tr.eval_mean_samples = None
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = -2.0
    intr = np.array([40.0, 40.0, 16.0, 16.0], np.float32)
    H = W = 32

    img_u8, _ = tr.render_frame(pose, intr, H, W, chunk=256)
    tr.eval_f32_frames = True
    img_f32, _ = tr.render_frame(pose, intr, H, W, chunk=256)
    assert np.max(np.abs(img_u8 - img_f32)) <= 0.5 / 255.0 + 1e-6
    fg = img_f32[img_f32 < 0.999]  # off-background pixels
    off_lattice = np.abs(fg * 255.0 - np.round(fg * 255.0))
    assert np.any(off_lattice > 1e-3), "f32 frame still quantized"

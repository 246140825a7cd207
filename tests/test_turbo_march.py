"""Turbo march (v2) parity vs the v1 masked marcher, compaction and
placement correctness (including the custom-vjp backward)."""

import jax
import jax.numpy as jnp
import numpy as np

from ngp_tpu.config import RenderConfig
from ngp_tpu.models.occupancy import (
    compact_valid_samples,
    init_occupancy,
    march_rays,
    march_rays_turbo,
    pack_occupancy_payloads,
    place_compact,
    render_rays_grid,
    render_rays_grid_turbo,
)


def _cfg(**kw):
    kw.setdefault("bound", 1.0)
    kw.setdefault("min_near", 0.05)
    kw.setdefault("dt_gamma", 0.0)
    kw.setdefault("max_steps", 64)
    kw.setdefault("max_samples_per_ray", 16)
    kw.setdefault("grid_size", 16)
    kw.setdefault("turbo", True)
    kw.setdefault("coarse_candidates", 64)   # = max_steps: no pruning loss
    kw.setdefault("crossing_slots", 64)      # ample
    kw.setdefault("compact_mean_samples", 16)
    return RenderConfig(**kw)


def _rays(n=64, seed=0):
    rng = np.random.default_rng(seed)
    ro = np.tile(np.array([[0.0, 0.0, -2.0]], np.float32), (n, 1))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] = np.abs(d[:, 2]) + 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(ro), jnp.asarray(d)


def _random_state(cfg, seed=1, frac=0.3):
    rng = np.random.default_rng(seed)
    state = init_occupancy(cfg)
    occ = jnp.asarray(
        rng.random((cfg.cascades,) + (cfg.grid_size,) * 3) < frac
    )
    cp, fp = pack_occupancy_payloads(occ)
    return state.replace(occ_grid=occ, coarse_payload=cp, fine_payload=fp)


def test_turbo_march_matches_v1():
    cfg = _cfg()
    state = _random_state(cfg)
    ro, rd = _rays()
    m1 = march_rays(ro, rd, state, cfg)
    m2 = march_rays_turbo(ro, rd, state, cfg)
    np.testing.assert_array_equal(np.asarray(m1["mask"]), np.asarray(m2["mask"]))
    np.testing.assert_allclose(
        np.asarray(m1["ts"]), np.asarray(m2["ts"]), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(m1["xyzs"]), np.asarray(m2["xyzs"]), atol=1e-5
    )


def test_turbo_march_bound2_cascades():
    cfg = _cfg(bound=2.0, max_steps=128, coarse_candidates=128, crossing_slots=128)
    state = _random_state(cfg, frac=0.4)
    ro, rd = _rays(seed=3)
    m1 = march_rays(ro, rd, state, cfg)
    m2 = march_rays_turbo(ro, rd, state, cfg)
    np.testing.assert_array_equal(np.asarray(m1["mask"]), np.asarray(m2["mask"]))
    np.testing.assert_allclose(np.asarray(m1["ts"]), np.asarray(m2["ts"]), atol=1e-6)


def test_turbo_march_adaptive_dt_matches_v1():
    """dt_gamma > 0 (the reference's default for real captures,
    main_nerf.py:33 dt_gamma=1/128): the turbo march must reproduce the
    v1 marcher's adaptive clamp-recurrence lattice exactly."""
    cfg = _cfg(
        dt_gamma=1 / 128, max_steps=128, coarse_candidates=256,
        crossing_slots=128, max_samples_per_ray=32,
    )
    state = _random_state(cfg, frac=0.3)
    ro, rd = _rays(seed=21)
    m1 = march_rays(ro, rd, state, cfg)
    m2 = march_rays_turbo(ro, rd, state, cfg)
    np.testing.assert_array_equal(np.asarray(m1["mask"]), np.asarray(m2["mask"]))
    mask = np.asarray(m1["mask"])
    np.testing.assert_array_equal(
        np.asarray(m1["ts"])[mask], np.asarray(m2["ts"])[mask]
    )
    np.testing.assert_array_equal(
        np.asarray(m1["deltas"])[mask], np.asarray(m2["deltas"])[mask]
    )


def test_turbo_march_adaptive_bound2():
    """Adaptive stepping across cascades (bound=2, dt_gamma=1/128) —
    the exact configuration of real colmap scenes that round 2 only
    supported on the slow v1 path."""
    cfg = _cfg(
        bound=2.0, dt_gamma=1 / 128, max_steps=128,
        coarse_candidates=256, crossing_slots=128, max_samples_per_ray=32,
    )
    state = _random_state(cfg, seed=4, frac=0.4)
    ro, rd = _rays(seed=23)
    m1 = march_rays(ro, rd, state, cfg)
    m2 = march_rays_turbo(ro, rd, state, cfg)
    np.testing.assert_array_equal(np.asarray(m1["mask"]), np.asarray(m2["mask"]))
    mask = np.asarray(m1["mask"])
    np.testing.assert_array_equal(
        np.asarray(m1["ts"])[mask], np.asarray(m2["ts"])[mask]
    )


def test_turbo_march_adaptive_perturb_matches_v1():
    cfg = _cfg(dt_gamma=1 / 128, max_steps=128, coarse_candidates=256,
               crossing_slots=128, max_samples_per_ray=32)
    state = _random_state(cfg, frac=0.3)
    ro, rd = _rays(seed=29)
    k = jax.random.PRNGKey(5)
    m1 = march_rays(ro, rd, state, cfg, rng=k, perturb=True)
    m2 = march_rays_turbo(ro, rd, state, cfg, rng=k, perturb=True)
    np.testing.assert_array_equal(np.asarray(m1["mask"]), np.asarray(m2["mask"]))
    mask = np.asarray(m1["mask"])
    np.testing.assert_array_equal(
        np.asarray(m1["ts"])[mask], np.asarray(m2["ts"])[mask]
    )


def test_adaptive_lattice_reaches_far():
    """lattice_probes for dt_gamma>0 must span the full AABB chord even
    when max_steps alone would fall short (bound=2, max_steps=256:
    ~300 adaptive probes are needed)."""
    from ngp_tpu.models.occupancy import lattice_probes, t_lattice

    cfg = RenderConfig(bound=2.0, min_near=0.05, dt_gamma=1 / 128,
                       max_steps=256, grid_size=32)
    K = lattice_probes(cfg)
    nears = jnp.asarray([cfg.min_near])
    fars = jnp.asarray([cfg.min_near + 2 * np.sqrt(3) * cfg.bound])
    ts, dts = t_lattice(nears, fars, cfg)
    assert ts.shape[1] == K
    # worst-case ray (enters at min_near): last probe reaches its far
    assert float(ts[0, -1]) >= float(fars[0])
    # and the lattice obeys the reference recurrence
    # dt = clamp(t*gamma, dt_min, dt_max) (raymarching.cu:345-346)
    dt_min = 2 * np.sqrt(3) / cfg.max_steps
    dt_max = 2 * np.sqrt(3) * (2 ** (cfg.cascades - 1)) / cfg.grid_size
    t = np.asarray(ts[0])
    d = np.asarray(dts[0])
    np.testing.assert_allclose(
        d, np.clip(t * cfg.dt_gamma, dt_min, dt_max), rtol=1e-6
    )
    np.testing.assert_allclose(t[1:], (t + d)[:-1], rtol=1e-6)


def test_turbo_overflow_counter():
    """n_dropped reports budget overflow; ample budgets report zero;
    the fine-rate-calibrated estimate tracks TRUE drops far better than
    the raw (assume-every-drop-was-occupied) upper bound."""
    # ample: candidates = lattice length, S = lattice length => nothing
    # can ever be dropped
    cfg_full = _cfg(max_samples_per_ray=64)
    cfg_tight = _cfg(crossing_slots=2, coarse_candidates=8,
                     max_samples_per_ray=4)
    state = _random_state(cfg_full, frac=0.5)
    ro, rd = _rays(n=16, seed=31)
    mf = march_rays_turbo(ro, rd, state, cfg_full)
    mt = march_rays_turbo(ro, rd, state, cfg_tight)
    assert float(np.asarray(mf["n_dropped"]).sum()) == 0
    # tight budgets on a 50%-occupied scene must drop something
    assert float(np.asarray(mt["n_dropped"]).sum()) > 0

    # calibration accuracy: true drops = full-budget samples - tight
    # samples (the tight march's survivors are a prefix of the full
    # set, so the difference IS the dropped count)
    true_drop = float(
        (np.asarray(mf["n_total"]) - np.asarray(mt["n_total"])).sum()
    )
    est = float(np.asarray(mt["n_dropped"]).sum())
    assert true_drop > 0
    # within 50% of truth (the raw upper bound overstated 2-4x)
    assert 0.5 * true_drop <= est <= 1.6 * true_drop, (est, true_drop)


def test_crossing_budget_drops_far_first():
    # tiny crossing budget: near samples must survive, far ones drop
    cfg_full = _cfg()
    cfg_tight = _cfg(crossing_slots=2)
    state = _random_state(cfg_full, frac=0.5)
    ro, rd = _rays(n=16, seed=5)
    mf = march_rays_turbo(ro, rd, state, cfg_full)
    mt = march_rays_turbo(ro, rd, state, cfg_tight)
    nt = np.asarray(mt["n_total"])
    nf = np.asarray(mf["n_total"])
    assert (nt <= nf).all()
    # surviving samples are a prefix of the full set
    for i in range(16):
        k = int(nt[i])
        np.testing.assert_allclose(
            np.asarray(mt["ts"])[i, :k], np.asarray(mf["ts"])[i, :k], atol=1e-6
        )


def test_coarse_lookup_pallas_kernel():
    """Pallas coarse-lookup (ops/pallas/march_kernels.py) matches the
    XLA one-hot formulation bit-for-bit (interpret mode on CPU)."""
    from ngp_tpu.models.occupancy import _coarse_lookup
    from ngp_tpu.ops.pallas.march_kernels import coarse_lookup_bits

    rng = np.random.default_rng(17)
    R = 16  # payload rows; cells = R * 1024
    payload = jnp.asarray(
        rng.integers(0, 256, size=(R, 128)).astype(np.float32)
    )
    fc = jnp.asarray(
        rng.integers(0, R * 1024, size=(7, 193)).astype(np.int32)
    )
    ref = _coarse_lookup(payload, fc)
    got = coarse_lookup_bits(payload, fc, block=256)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_compact_and_place_roundtrip():
    # place_compact requires 8-ALIGNED segments: counts multiples of 8
    rng = np.random.default_rng(7)
    N, S, F = 32, 16, 4
    counts = rng.integers(0, S // 8 + 1, size=N) * 8
    mask = jnp.asarray(np.arange(S)[None, :] < counts[:, None])
    budget = int(counts.sum())  # exact fit (multiple of 8)
    src, valid, offsets = compact_valid_samples(mask, budget)
    assert bool(valid.all())
    vals = jnp.asarray(rng.normal(size=(budget, F)).astype(np.float32))
    placed = place_compact(vals, offsets, src, S)
    # every valid (n, s) slot must hold vals[offsets[n] + s]
    o = np.asarray(offsets)
    p = np.asarray(placed)
    v = np.asarray(vals)
    for n in range(N):
        for s in range(int(counts[n])):
            np.testing.assert_allclose(p[n, s], v[o[n] + s])


def test_compact_block_uniform_matches_general():
    # the block_uniform fast path (block-granularity sort, 4x fewer
    # rows) must be bit-identical to the general per-sample path on
    # ALIGN-block-uniform masks, including straddling/overflow budgets
    rng = np.random.default_rng(21)
    N, S = 64, 24
    counts = rng.integers(0, S // 4 + 1, size=N) * 4  # ALIGN = 4
    mask = jnp.asarray(np.arange(S)[None, :] < counts[:, None])
    extra = jnp.asarray(rng.normal(size=(N, S)).astype(np.float32))
    total = int(counts.sum())
    for budget in (total, total - 8, total + 16, 4):
        ref = compact_valid_samples(mask, budget, extra=extra)
        got = compact_valid_samples(
            mask, budget, extra=extra, block_uniform=True
        )
        for r, g in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(r), np.asarray(g))


def test_place_compact_gradient():
    rng = np.random.default_rng(8)
    N, S, F = 16, 16, 4
    counts = rng.integers(1, S // 8 + 1, size=N) * 8
    mask = jnp.asarray(np.arange(S)[None, :] < counts[:, None])
    budget = int(counts.sum())
    src, valid, offsets = compact_valid_samples(mask, budget)
    g = jnp.asarray(rng.normal(size=(N, S, F)).astype(np.float32))
    maskf = jnp.asarray(mask)[..., None]

    def loss(vals):
        placed = place_compact(vals, offsets, src, S)
        return jnp.sum(jnp.where(maskf, placed, 0.0) * g)

    vals = jnp.asarray(rng.normal(size=(budget, F)).astype(np.float32))
    grad = jax.grad(loss)(vals)
    # reference: d vals[m] = masked g[n, s] at the slot it fills
    o = np.asarray(offsets)
    gref = np.zeros((budget, F), np.float32)
    for n in range(N):
        for s in range(int(counts[n])):
            gref[o[n] + s] = np.asarray(g)[n, s]
    np.testing.assert_allclose(np.asarray(grad), gref, atol=1e-6)


def test_render_turbo_matches_v1_render():
    cfg = _cfg()
    state = _random_state(cfg, frac=0.4)
    ro, rd = _rays(n=32, seed=11)

    def density_fn(x):
        s = jnp.sum(jnp.maximum(1.0 - jnp.linalg.norm(x, axis=-1), 0.0) * 8.0, axis=-1) \
            if False else jnp.maximum(1.0 - jnp.linalg.norm(x, axis=-1), 0.0) * 8.0
        return s, x * 0.5 + 0.5

    def color_fn(d, geo):
        return jnp.clip(geo, 0.0, 1.0)

    o1 = render_rays_grid(density_fn, color_fn, ro, rd, state, cfg)
    o2 = render_rays_grid_turbo(density_fn, color_fn, ro, rd, state, cfg)
    np.testing.assert_allclose(
        np.asarray(o1["image"]), np.asarray(o2["image"]), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(o1["depth"]), np.asarray(o2["depth"]), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(o1["weights_sum"]), np.asarray(o2["weights_sum"]), atol=1e-4
    )


def test_render_turbo_direct_matches_compacted():
    """The no-compaction eval render (render_rays_grid_turbo_direct)
    equals the compacted render when the budget doesn't bind: the
    network sees the same sample positions either way (the compact
    batch is just a re-packing), and masked slots never reach the
    composite."""
    from ngp_tpu.models.occupancy import render_rays_grid_turbo_direct

    cfg = _cfg()
    state = _random_state(cfg, frac=0.4)
    ro, rd = _rays(n=32, seed=11)

    def density_fn(x):
        return jnp.maximum(1.0 - jnp.linalg.norm(x, axis=-1), 0.0) * 8.0, \
            x * 0.5 + 0.5

    def color_fn(d, geo):
        return jnp.clip(geo, 0.0, 1.0)

    o1 = render_rays_grid_turbo(
        density_fn, color_fn, ro, rd, state, cfg,
        budget=ro.shape[0] * cfg.max_samples_per_ray,
    )
    o2 = render_rays_grid_turbo_direct(
        density_fn, color_fn, ro, rd, state, cfg
    )
    for k in ("image", "depth", "weights_sum"):
        np.testing.assert_allclose(
            np.asarray(o1[k]), np.asarray(o2[k]), atol=1e-5
        )

    # static per-ray cap: equals the compacted render whose water-fill
    # level produces the same uniform allowance
    o3 = render_rays_grid_turbo_direct(
        density_fn, color_fn, ro, rd, state, cfg, max_samples=8
    )
    assert o3["image"].shape == o1["image"].shape
    # rays with <= 8 samples render identically under the cap
    n_tot = np.asarray(
        march_rays_turbo(ro, rd, state, cfg)["mask"].sum(axis=1)
    )
    short = n_tot <= 8
    assert short.any()
    np.testing.assert_allclose(
        np.asarray(o1["image"])[short], np.asarray(o3["image"])[short],
        atol=1e-5,
    )


def test_render_turbo_budget_water_fills():
    """A scarce EXPLICIT (eval) budget is split as a uniform per-ray
    depth allowance (water-filling): no ray that marched samples is
    dropped whole, and the total stays within the budget."""
    cfg = _cfg(compact_mean_samples=4)  # tight global budget
    state = _random_state(cfg, frac=0.5)
    ro, rd = _rays(n=32, seed=13)

    def density_fn(x):
        return jnp.ones(x.shape[:-1]) * 4.0, x * 0.5 + 0.5

    def color_fn(d, geo):
        return jnp.clip(geo, 0.0, 1.0)

    out = render_rays_grid_turbo(
        density_fn, color_fn, ro, rd, state, cfg, budget=32 * 4
    )
    assert np.isfinite(np.asarray(out["image"])).all()
    # budgeted sample count can never exceed the global budget
    assert int(out["n_samples"]) <= 32 * 4
    # water-filling: every ray with marched samples still composites
    # something (the old ray-major truncation zeroed trailing rays
    # whole once the budget filled)
    m = march_rays_turbo(ro, rd, state, cfg)
    n_total = np.asarray(m["n_total"])
    ws = np.asarray(out["weights_sum"])
    assert (ws[n_total > 0] > 0.0).all()
    # ... and the allowance is uniform up to the slack bonus: usage is
    # capped by the water level k* plus one ALIGN block of distributed
    # leftover budget
    budget = 32 * cfg.compact_mean_samples
    n8 = np.minimum(-(-n_total // 4) * 4, m["mask"].shape[1])
    ks = np.arange(0, m["mask"].shape[1] + 1, 4)
    tot = np.minimum(n8[None, :], ks[:, None]).sum(axis=1)
    k_star = max(ks[tot <= budget].max(), 4)
    used = int(np.asarray(out["n_samples"]))
    assert used <= budget
    assert used <= np.minimum(n8, k_star + 4).sum()


def test_occupied_aabb_and_tight_lattice():
    """occupied_aabb bounds every occupied cell (+1 cell pad); a march
    on the tight box + matching lattice_span produces samples only
    inside the box and renders the same content as the full lattice."""
    import dataclasses

    from ngp_tpu.models.occupancy import lattice_probes, occupied_aabb

    cfg = _cfg()
    H = cfg.grid_size
    state = init_occupancy(cfg)
    # occupy a compact blob: cells [4..7)^3 of cascade 0
    occ = np.zeros((cfg.cascades, H, H, H), bool)
    occ[0, 4:7, 4:7, 4:7] = True
    occ_j = jnp.asarray(occ)
    cp, fp = pack_occupancy_payloads(occ_j)
    state = state.replace(occ_grid=occ_j, coarse_payload=cp, fine_payload=fp)

    box = np.asarray(occupied_aabb(state, cfg))
    cell = 2.0 * cfg.bound / H
    want_lo = (4 / H * 2 - 1) * cfg.bound - cell
    want_hi = (7 / H * 2 - 1) * cfg.bound + cell
    np.testing.assert_allclose(box[:3], want_lo, atol=1e-6)
    np.testing.assert_allclose(box[3:], want_hi, atol=1e-6)

    # empty grid falls back to the full scene box
    empty = state.replace(occ_grid=jnp.zeros_like(occ_j))
    np.testing.assert_allclose(
        np.asarray(occupied_aabb(empty, cfg)), np.asarray(cfg.aabb)
    )

    # tight lattice: span covers the box diameter; K shrinks; samples
    # stay inside the box; the rendered content matches the full march
    span = float(np.linalg.norm(box[3:] - box[:3]))
    tight_cfg = dataclasses.replace(cfg, lattice_span=span)
    assert lattice_probes(tight_cfg) < lattice_probes(cfg)
    ro, rd = _rays(n=64, seed=3)

    def density_fn(x):
        return jnp.ones(x.shape[:-1]) * 8.0, x * 0.5 + 0.5

    def color_fn(d, geo):
        return jnp.clip(geo, 0.0, 1.0)

    m_t = march_rays_turbo(ro, rd, state, tight_cfg, aabb=jnp.asarray(box))
    pts = np.asarray(m_t["xyzs"])[np.asarray(m_t["mask"])]
    assert (pts >= box[:3] - 1e-5).all() and (pts <= box[3:] + 1e-5).all()

    out_full = render_rays_grid_turbo(density_fn, color_fn, ro, rd, state, cfg)
    out_tight = render_rays_grid_turbo(
        density_fn, color_fn, ro, rd, state, tight_cfg,
        aabb=jnp.asarray(box),
    )
    # same occupied segments, lattice phase shifted by < dt: images and
    # opacities agree closely
    np.testing.assert_allclose(
        np.asarray(out_tight["weights_sum"]),
        np.asarray(out_full["weights_sum"]), atol=0.05,
    )
    np.testing.assert_allclose(
        np.asarray(out_tight["image"]), np.asarray(out_full["image"]),
        atol=0.05,
    )

"""Occupancy-grid accelerated ray marching — the TPU-native redesign of
the reference's CUDA raymarching extension.

Reference semantics being reproduced (SURVEY.md §2.1, §3.4):
- multi-cascade density grid [CAS, 128^3]; cascade c covers
  [-min(2^c, bound), min(2^c, bound)]^3 (renderer.py:73, 87-101)
- mip level per sample = max(mip_from_pos, mip_from_dt)
  (raymarching.cu:42-54)
- adaptive step dt = clamp(t * dt_gamma, dt_min, dt_max) with
  dt_min = 2*sqrt(3)/max_steps, dt_max = 2*sqrt(3)*2^(C-1)/H
  (raymarching.cu:345-346)
- EMA-max density-grid update with jittered cell-center queries;
  full sweep for the first 16 updates, then partial random refresh
  (renderer.py:445-536); packbits threshold min(mean_density,
  density_thresh)
- mark_untrained_grid: cells seen by no training camera get -1 and are
  never marked occupied (renderer.py:380-442)

TPU-first redesign (NOT a translation):
- The CUDA marcher is a per-ray DDA with atomic packing into a dynamic
  [M, 3] buffer. Observation: in BOTH its branches (occupied: record
  and step; empty: skip) the parameter t advances through the SAME
  recurrence t_{k+1} = t_k + clamp(t_k*gamma, dt_min, dt_max) — the
  visited t values form a deterministic lattice independent of
  occupancy. So the march becomes: (1) materialise the t-lattice in
  closed form / one scan, (2) gather occupancy at every lattice point
  (cheap: one uint8 load per point), (3) compact each ray's occupied
  points to a static per-ray budget S with a cumsum + scatter
  (replacing atomicAdd packing), (4) evaluate the network ONCE on the
  dense [N, S] batch (MXU-shaped), (5) composite with an exclusive
  cumprod (autodiff gives the analytic backward raymarching.cu:602-693
  for free). Inference early-exit (alive-ray compaction,
  raymarching.cu:700-914) becomes transmittance masking: samples after
  T < T_thresh get zero weight, which is bitwise the same result.
- The grid lives in plain row-major (cascade, x, y, z) order — Morton
  order buys DDA cache locality on GPU, nothing for XLA gathers.
"""

from __future__ import annotations

import functools
import math
from typing import Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ngp_tpu.config import RenderConfig
from ngp_tpu.ops.morton import packbits
from ngp_tpu.ops.rays import near_far_from_aabb, sph_from_ray

SQRT3 = math.sqrt(3.0)


def dt_bounds(cfg: RenderConfig) -> Tuple[float, float]:
    """(dt_min, dt_max) of the reference's adaptive step clamp
    dt = clamp(t * dt_gamma, dt_min, dt_max) (raymarching.cu:345-346)."""
    dt_min = 2.0 * SQRT3 / cfg.max_steps
    dt_max = 2.0 * SQRT3 * (2 ** (cfg.cascades - 1)) / cfg.grid_size
    return dt_min, dt_max


@functools.lru_cache(maxsize=None)
def _adaptive_probe_count(
    dt_gamma: float, dt_min: float, dt_max: float, t0: float, span: float
) -> int:
    """Worst-case probe count of the adaptive recurrence
    t += clamp(t*gamma, dt_min, dt_max) from t0 until it has advanced
    by ``span``. Python floats at trace time — static under jit. The
    worst case over rays is the SMALLEST t0 (min_near): adaptive steps
    grow with absolute t, so rays entering farther out need fewer."""
    cap = int(math.ceil(span / dt_min)) + 2  # uniform lattice bound
    t, k = t0, 0
    end = t0 + span
    while t < end and k < cap:
        t += min(max(t * dt_gamma, dt_min), dt_max)
        k += 1
    # +2: one probe AT/past the end, one of f32-vs-f64 rounding slack
    # (the device scan accumulates in f32)
    return max(k + 2, 2)


def lattice_probes(cfg: RenderConfig) -> int:
    """March-lattice probe count — static (pure config), so shapes stay
    fixed under jit.

    dt_gamma == 0: ceil(max_steps * bound), so probes at dt_min
    spacing cover the longest chord through [-bound, bound]^3
    (2*sqrt(3)*bound). dt_gamma > 0: the adaptive recurrence's
    worst-case count over that chord — typically FAR fewer than the
    uniform count at bound > 1 (geometric dt growth), which is exactly
    why the reference defaults to dt_gamma=1/128 for real captures
    (main_nerf.py:33). cfg.lattice_span shrinks the covered span (at
    UNCHANGED dt) when the caller knows occupied space is smaller —
    see occupied_aabb."""
    span = cfg.lattice_span
    dt_min, dt_max = dt_bounds(cfg)
    if cfg.dt_gamma == 0.0:
        if span is None:
            return int(math.ceil(cfg.max_steps * max(1.0, cfg.bound)))
        return max(int(math.ceil(span / dt_min)) + 2, 2)
    return _adaptive_probe_count(
        cfg.dt_gamma, dt_min, dt_max, cfg.min_near,
        2.0 * SQRT3 * cfg.bound if span is None else span,
    )


@flax.struct.dataclass
class OccupancyState:
    """Device-side density-grid state (renderer.py:87-101).

    ``coarse_payload``/``fine_payload`` are bit-packed views of
    ``occ_grid`` maintained for the turbo march (march_rays_turbo):
    - coarse_payload [CAS*Hc, 128] f32: byte values (0-255) of the
      max-pooled Hc^3 occupancy, consumed by a one-hot MXU matmul.
    - fine_payload [CAS*Hc^3, 18] u32: per coarse cell, the 64
      occupancy bits of its 4^3 fine sub-cells (words 0-1) plus the 64
      fine cells' log-quantized u8 densities (words 2-17, 4 codes per
      word, same z-fastest cell order) — the eval march's
      transmittance-proxy early-out (t_proxy_thresh) decodes each
      candidate's OWN fine cell density from these, so grazing rays
      see no phantom optical depth (a 4^3 max-pool variant measured
      PSNR 35 -> 15 from exactly that).
    """

    density_grid: jnp.ndarray  # [CAS, H, H, H] f32; -1 = untrained
    occ_grid: jnp.ndarray  # [CAS, H, H, H] bool (thresholded)
    mean_density: jnp.ndarray  # scalar f32
    iter_density: jnp.ndarray  # scalar i32
    # payloads are optional (None): only the turbo march needs them;
    # update_occupancy always returns them freshly packed
    coarse_payload: Optional[jnp.ndarray] = None  # [CAS*Hc, 128] f32
    fine_payload: Optional[jnp.ndarray] = None  # [CAS*Hc^3, 18] u32
    # 3^3-dilated coarse occupancy, byte-packed like coarse_payload —
    # consumed by the eval-cull ray prepass (ray_prepass); the
    # dilation makes a sparse probe lattice conservatively safe
    prepass_payload: Optional[jnp.ndarray] = None  # [CAS*Hc, 128] f32


COARSE_FACTOR = 4  # fine cells per coarse cell per axis


def _erode3(g: jnp.ndarray) -> jnp.ndarray:
    """3^3 min-pool (erosion) of [CAS, H, H, H], zero-padded: cells
    outside the grid count as empty, per cascade independently."""
    for ax in (1, 2, 3):
        z = jnp.zeros_like(jax.lax.slice_in_dim(g, 0, 1, axis=ax))
        lo = jnp.concatenate(
            [z, jax.lax.slice_in_dim(g, 0, g.shape[ax] - 1, axis=ax)],
            axis=ax)
        hi = jnp.concatenate(
            [jax.lax.slice_in_dim(g, 1, g.shape[ax], axis=ax), z], axis=ax)
        g = jnp.minimum(g, jnp.minimum(lo, hi))
    return g


def pack_occupancy_payloads(occ_grid: jnp.ndarray, density_grid=None):
    """occ_grid [CAS, H, H, H] bool -> (coarse_payload, fine_payload).

    Dense bit-twiddling, no scatter; runs inside the jitted grid
    refresh (the reference's packbits step, raymarching.cu:268-300,
    restructured for matmul/crossing lookups instead of byte gathers).

    ``density_grid`` (optional, [CAS, H, H, H] f32): when given, each
    fine-payload row also carries its 64 fine cells' ERODED densities
    (3^3 min-pool, zero outside the grid), log-quantized to u8 (code c:
    density = 2^(c/8 - 16), c = 0 means zero; <= 4.4% relative step
    over ~2^-16..2^16) and packed 4 codes per u32 into words 2-17 —
    consumed by the eval march's transmittance-proxy early-out. The
    EROSION is load-bearing: the grid stores EMA-MAX point samples, so
    every boundary cell of an object reads fully dense; a ray GRAZING
    a thin rod tangentially crosses many boundary cells and would
    accumulate phantom optical depth (measured: proxy-on vs proxy-off
    image PSNR 24.9 dB raw vs 59+ dB eroded on the analytic hard
    scene). Eroded densities UNDERestimate the integrand — only true
    interiors cull, which is the safe direction for an early-out.
    Rows are [18] u32 either way; without a density grid the code
    words are 0 (= proxy disabled).
    """
    cas, H = occ_grid.shape[0], occ_grid.shape[1]
    F = COARSE_FACTOR
    Hc = H // F
    blocks = occ_grid.reshape(cas, Hc, F, Hc, F, Hc, F)
    blocks = blocks.transpose(0, 1, 3, 5, 2, 4, 6).reshape(cas * Hc**3, F**3)
    # fine payload: 64 bits -> 2 u32 words (bit b of word w = sub-cell
    # 32*w + b in (ox*F + oy)*F + oz order)
    bits = blocks.astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    w0 = jnp.sum(bits[:, :32] << shifts[None, :], axis=1, dtype=jnp.uint32)
    w1 = jnp.sum(bits[:, 32:] << shifts[None, :], axis=1, dtype=jnp.uint32)
    R = w0.shape[0]
    if density_grid is None:
        dens_words = jnp.zeros((R, 16), jnp.uint32)
    else:
        d = _erode3(jnp.maximum(density_grid, 0.0)).reshape(
            cas, Hc, F, Hc, F, Hc, F
        ).transpose(0, 1, 3, 5, 2, 4, 6).reshape(R, F**3)
        # FLOOR, not round: the decoded proxy density must be a strict
        # underestimate of the eroded density so t_proxy_thresh can sit
        # at the composite's exact t_thresh (round could overshoot by
        # up to half a code step, ~2.2%)
        code = jnp.where(
            d > 2.0 ** -16,
            jnp.clip(jnp.floor((jnp.log2(jnp.maximum(d, 1e-30)) + 16.0)
                               * 8.0), 1.0, 255.0),
            0.0,
        ).astype(jnp.uint32)  # [R, 64]
        shifts8 = (jnp.arange(4, dtype=jnp.uint32) * 8)[None, None, :]
        dens_words = jnp.sum(
            code.reshape(R, 16, 4) << shifts8, axis=2, dtype=jnp.uint32
        )  # [R, 16]: word j byte b = cell 4j+b (z-fastest order)
    fine_payload = jnp.concatenate(
        [w0[:, None], w1[:, None], dens_words], axis=1
    )  # [R, 18]
    # coarse: any fine bit set; packed 8 cells/byte (z fastest), bytes
    # laid out [rows, 128] for the one-hot matmul lookup
    coarse = jnp.any(blocks, axis=1)  # [CAS*Hc^3], z fastest
    coarse_payload = _pack_bits_payload(coarse)
    return coarse_payload, fine_payload


def _pack_bits_payload(bits_flat: jnp.ndarray) -> jnp.ndarray:
    """Flat cell bits (z fastest) -> [rows, 128] f32 byte payload, the
    layout `_coarse_lookup` / the Pallas lookup kernel consume."""
    shifts = jnp.arange(8, dtype=jnp.uint32)
    byte_bits = bits_flat.reshape(-1, 8).astype(jnp.uint32)
    bytes_ = jnp.sum(byte_bits << shifts[None, :], axis=1, dtype=jnp.uint32)
    pad = (-bytes_.shape[0]) % 128
    if pad:
        bytes_ = jnp.concatenate([bytes_, jnp.zeros((pad,), jnp.uint32)])
    return bytes_.astype(jnp.float32).reshape(-1, 128)


def pack_prepass_payload(occ_grid: jnp.ndarray) -> jnp.ndarray:
    """occ_grid [CAS, H, H, H] bool -> dilated coarse payload
    [CAS*Hc, 128] f32 for :func:`ray_prepass`.

    Per cascade: pool fine occupancy to the coarse Hc^3 grid, then
    dilate with a stride-1 3^3 max-pool. The dilation guarantees the
    prepass's sparse probe lattice (spacing = one cascade-0 coarse
    cell h) cannot miss occupied space: any main-march sample point is
    within h/2 of some prepass probe, i.e. within one coarse cell of
    the probe's cell in every cascade, which the 3^3 dilation covers.
    (Cross-cascade level wobble of +-1 is handled by the prepass
    testing three candidate levels when cascades > 1.)
    """
    cas, H = occ_grid.shape[0], occ_grid.shape[1]
    F = COARSE_FACTOR
    Hc = H // F
    pooled = jnp.any(
        occ_grid.reshape(cas, Hc, F, Hc, F, Hc, F), axis=(2, 4, 6)
    )  # [cas, Hc, Hc, Hc]
    d = pooled
    for ax in (1, 2, 3):
        lo = jnp.concatenate(
            [jax.lax.slice_in_dim(d, 1, Hc, axis=ax),
             jax.lax.slice_in_dim(d, Hc - 1, Hc, axis=ax)], axis=ax
        )
        hi = jnp.concatenate(
            [jax.lax.slice_in_dim(d, 0, 1, axis=ax),
             jax.lax.slice_in_dim(d, 0, Hc - 1, axis=ax)], axis=ax
        )
        d = d | lo | hi
    return _pack_bits_payload(d.reshape(-1))


def init_occupancy(cfg: RenderConfig) -> OccupancyState:
    H = cfg.grid_size
    cas = cfg.cascades
    occ = jnp.ones((cas, H, H, H), jnp.bool_)  # start fully occupied
    coarse_payload, fine_payload = pack_occupancy_payloads(occ)
    return OccupancyState(
        density_grid=jnp.zeros((cas, H, H, H), jnp.float32),
        occ_grid=occ,
        mean_density=jnp.float32(0.0),
        iter_density=jnp.int32(0),
        coarse_payload=coarse_payload,
        fine_payload=fine_payload,
        prepass_payload=pack_prepass_payload(occ),
    )


@functools.lru_cache(maxsize=4)
def _morton_perm(H: int):
    """Row-major flat index of each Morton code m in [0, H^3) — numpy
    (host staging; eager jnp dispatch through the tunnel is seconds)."""
    m = np.arange(H * H * H, dtype=np.uint64)

    def compact(v):
        v = v & 0x1249249249249249
        v = (v | (v >> 2)) & 0x10C30C30C30C30C3
        v = (v | (v >> 4)) & 0x100F00F00F00F00F
        v = (v | (v >> 8)) & 0x1F0000FF0000FF
        v = (v | (v >> 16)) & 0x1F00000000FFFF
        v = (v | (v >> 32)) & 0x1FFFFF
        return v

    x, y, z = compact(m), compact(m >> 1), compact(m >> 2)
    return ((x * H + y) * H + z).astype(np.int32)


def bitfield(state: OccupancyState) -> jnp.ndarray:
    """uint8 density_bitfield with REFERENCE cell order: the reference
    writes each cell at its Morton code (nerf/renderer.py:459-462 via
    morton3D, then packbits raymarching.cu:268), so bit m here is the
    cell at coords morton3d_invert(m) — a reference checkpoint consumer
    reads identical bytes."""
    H = state.occ_grid.shape[-1]
    flat = state.occ_grid.reshape(state.occ_grid.shape[0], -1)
    zorder = jnp.take(flat, jnp.asarray(_morton_perm(H)), axis=1)
    return packbits(zorder.astype(jnp.float32).reshape(-1), 0.5)


def occupied_aabb(state: OccupancyState, cfg: RenderConfig) -> jnp.ndarray:
    """World-space AABB [6] f32 of every occupied cell, padded by one
    fine cell per cascade — for tight march lattices (the
    ``cfg.lattice_span`` static probe cut).

    The march can only materialize samples in occupied fine cells, so a
    per-ray [near, far] clipped to this box plus a lattice_span covering
    its diameter renders identically up to a sub-dt lattice phase shift
    (the probes outside it never produced samples; the reference's DDA
    skips them without consuming steps, raymarching.cu:388-399 — this
    is the fixed-shape analog of not paying for them at all). Falls
    back to the full scene box when nothing is occupied (early
    training). Device-side; callers fetch the [6] array at grid-refresh
    cadence to (re)bucket the static probe count.
    """
    H = cfg.grid_size
    occ = state.occ_grid
    lo = jnp.full((3,), jnp.inf, jnp.float32)
    hi = jnp.full((3,), -jnp.inf, jnp.float32)
    for c in range(occ.shape[0]):
        bc = float(min(2.0**c, cfg.bound))
        cell = 2.0 * bc / H
        g = occ[c]
        for ax in range(3):
            prof = jnp.any(g, axis=tuple(a for a in range(3) if a != ax))
            anyc = jnp.any(prof)
            first = jnp.argmax(prof).astype(jnp.float32)
            last = (H - 1 - jnp.argmax(prof[::-1])).astype(jnp.float32)
            lo_w = (first / H * 2.0 - 1.0) * bc - cell
            hi_w = ((last + 1.0) / H * 2.0 - 1.0) * bc + cell
            lo = lo.at[ax].set(
                jnp.minimum(lo[ax], jnp.where(anyc, lo_w, jnp.inf))
            )
            hi = hi.at[ax].set(
                jnp.maximum(hi[ax], jnp.where(anyc, hi_w, -jnp.inf))
            )
    full = jnp.asarray(cfg.aabb, jnp.float32)
    valid = jnp.all(hi > lo)
    lo = jnp.where(valid, jnp.maximum(lo, full[:3]), full[:3])
    hi = jnp.where(valid, jnp.minimum(hi, full[3:]), full[3:])
    return jnp.concatenate([lo, hi])


# ---------------------------------------------------------------------------
# mip levels
# ---------------------------------------------------------------------------


def _frexp_exponent(x: jnp.ndarray) -> jnp.ndarray:
    """IEEE frexp exponent: x = m * 2^e with m in [0.5, 1)."""
    safe = jnp.maximum(x, 1e-30)
    return (jnp.floor(jnp.log2(safe)) + 1).astype(jnp.int32)


def mip_from_pos(x: jnp.ndarray, cascades: int) -> jnp.ndarray:
    """raymarching.cu:42-47: cascade from |pos| (frexp exponent of max axis)."""
    mx = jnp.max(jnp.abs(x), axis=-1)
    return jnp.clip(_frexp_exponent(mx), 0, cascades - 1)


def mip_from_dt(dt: jnp.ndarray, grid_size: int, cascades: int) -> jnp.ndarray:
    """raymarching.cu:49-54: cascade whose cell size matches dt."""
    mx = dt * grid_size * 0.5
    return jnp.clip(_frexp_exponent(mx), 0, cascades - 1)


# ---------------------------------------------------------------------------
# marching
# ---------------------------------------------------------------------------


def t_lattice(
    nears: jnp.ndarray,
    fars: jnp.ndarray,
    cfg: RenderConfig,
    noise: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The deterministic march lattice (t values + step sizes), [N, K].

    For dt_gamma == 0 this is closed-form (t0 + k*dt_min) over
    K = lattice_probes(cfg) points — MORE than max_steps when bound > 1,
    so the lattice spans the full AABB chord 2*sqrt(3)*bound. In the
    reference, empty-space skips advance t without consuming the step
    budget (raymarching.cu:388-399) so rays always reach ``far``; here
    probes are decoupled from the sample budget S, so extending the
    (cheap) probe lattice reproduces that. For dt_gamma > 0 a lax.scan
    over lattice_probes(cfg) points, whose worst-case count also spans
    the chord (the adaptive dt growth makes it far shorter than the
    uniform count at bound > 1).
    """
    dt_min, dt_max = dt_bounds(cfg)

    def dt_of(t):
        return jnp.clip(t * cfg.dt_gamma, dt_min, dt_max)

    t0 = nears
    if noise is not None:
        t0 = t0 + dt_of(t0) * noise  # perturbed start (raymarching.cu:352)

    K = lattice_probes(cfg)
    if cfg.dt_gamma == 0.0:
        ks = jnp.arange(K, dtype=jnp.float32)
        ts = t0[:, None] + ks[None, :] * dt_min
        dts = jnp.full_like(ts, dt_min)
        return ts, dts

    def body(t, _):
        d = dt_of(t)
        return t + d, (t, d)

    _, (ts, dts) = jax.lax.scan(body, t0, None, length=K)
    return ts.T, dts.T  # [N, K]


def occupancy_at(
    state: OccupancyState, x: jnp.ndarray, dt: jnp.ndarray, cfg: RenderConfig
) -> jnp.ndarray:
    """Gather occupancy for world points x [..., 3] with step sizes dt."""
    H = cfg.grid_size
    cas = cfg.cascades
    level = jnp.maximum(
        mip_from_pos(x, cas), mip_from_dt(dt, H, cas)
    )  # [...]
    mip_bound = jnp.minimum(2.0**level.astype(jnp.float32), cfg.bound)
    # nearest cell (raymarching.cu:372-375)
    n = jnp.clip(
        (0.5 * (x / mip_bound[..., None] + 1.0) * H).astype(jnp.int32), 0, H - 1
    )
    flat = state.occ_grid.reshape(cas, -1)
    cell = (n[..., 0] * H + n[..., 1]) * H + n[..., 2]
    return flat[level, cell]


def march_rays(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    state: OccupancyState,
    cfg: RenderConfig,
    rng: Optional[jax.Array] = None,
    perturb: bool = False,
    max_samples: Optional[int] = None,
    aabb: Optional[jnp.ndarray] = None,
    t_range: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Fixed-shape masked equivalent of march_rays_train
    (raymarching.cu:312-490).

    ``aabb`` optionally overrides the scene box for the ray interval —
    the inference-crop feature (GUI aabb_infer sliders,
    nerf/gui.py:316-338; occupancy still uses the full cubic bound).
    ``t_range`` [N, 2] optionally clips each ray's [near, far] (the
    eval prepass's per-ray interval, :func:`ray_prepass`).

    Returns per-ray compacted samples:
      xyzs [N, S, 3], dirs [N, S, 3], ts [N, S], deltas [N, S],
      mask [N, S] (valid samples), nears/fars [N].
    """
    S = max_samples or cfg.max_samples_per_ray
    S = min(S, cfg.max_steps)  # budget can't exceed the lattice length
    N = rays_o.shape[0]
    if aabb is None:
        aabb = jnp.asarray(cfg.aabb, jnp.float32)
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, cfg.min_near)
    if t_range is not None:
        nears = jnp.maximum(nears, t_range[:, 0])
        fars = jnp.minimum(fars, t_range[:, 1])
    hit = fars > nears
    fars_c = jnp.where(hit, fars, nears)

    noise = None
    if perturb and rng is not None:
        noise = jax.random.uniform(rng, (N,))
    ts, dts = t_lattice(nears, fars_c, cfg, noise)  # [N, K]
    K = ts.shape[1]

    x = rays_o[:, None, :] + rays_d[:, None, :] * ts[..., None]
    x = jnp.clip(x, -cfg.bound, cfg.bound)
    occ = occupancy_at(state, x, dts, cfg)  # [N, K] bool
    valid = occ & (ts < fars_c[:, None]) & hit[:, None]

    # compact the first S valid lattice points per ray (replaces the
    # CUDA atomicAdd packing, raymarching.cu:405-414). TPU-friendly
    # formulation: NO scatter, NO searchsorted (a scatter serializes on
    # TPU; batched searchsorted costs 100ms+). Give valid candidates
    # key = k and invalid ones key = K + k, then the S smallest keys —
    # via the TPU-optimized top_k — are exactly the first S valid
    # indices in march order (~20us for 4096x1024).
    ks = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None, :], (N, K))
    key = jnp.where(valid, ks, ks + K)
    _, pos = jax.lax.top_k(-key, S)  # [N, S] ascending-key indices
    n_total = jnp.sum(valid, axis=-1)  # [N]
    mask = jnp.arange(S, dtype=jnp.int32)[None, :] < n_total[:, None]
    ts_c = jnp.where(mask, jnp.take_along_axis(ts, pos, axis=1), 0.0)
    dts_c = jnp.where(mask, jnp.take_along_axis(dts, pos, axis=1), 0.0)

    xyzs = rays_o[:, None, :] + rays_d[:, None, :] * ts_c[..., None]
    xyzs = jnp.clip(xyzs, -cfg.bound, cfg.bound)
    dirs = jnp.broadcast_to(rays_d[:, None, :], xyzs.shape)
    return {
        "xyzs": xyzs,
        "dirs": dirs,
        "ts": ts_c,
        "deltas": dts_c,
        "mask": mask,
        "nears": nears,
        "fars": fars,
    }


def prepass_spacing(cfg: RenderConfig) -> float:
    """Probe spacing of :func:`ray_prepass`: one cascade-0 coarse cell.
    Samples are then within h/2 (= half a coarse cell, at every
    cascade) of a probe, which the payload's 3^3 dilation covers."""
    return 2.0 * min(1.0, cfg.bound) / (cfg.grid_size // COARSE_FACTOR)


def prepass_probes(cfg: RenderConfig) -> int:
    """Static probe count of the prepass lattice (covers the marched
    span at :func:`prepass_spacing` + the half-step slack)."""
    h = prepass_spacing(cfg)
    span = (
        2.0 * SQRT3 * cfg.bound
        if cfg.lattice_span is None
        else cfg.lattice_span
    )
    return max(int(math.ceil(span / h)) + 2, 2)


def ray_prepass(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    state: OccupancyState,
    cfg: RenderConfig,
    aabb: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Conservative eval-cull prepass: cheap coarse hit test + per-ray
    t-range, the first round of the two-round inference march.

    The reference's inference loop stops paying for rays the moment
    they die (alive-ray compaction, raymarching.cu:700-914 +
    nerf/renderer.py:336-367). The TPU analog: ONE cheap pass over the
    whole frame probes a DILATED coarse occupancy grid at one-coarse-
    cell spacing (prepass_spacing — ~4x sparser than the march lattice
    and with none of its selection machinery), yielding per ray
      hit      — may this ray produce any march sample? (conservative:
                 no false negatives, guaranteed by the 3^3 dilation in
                 pack_prepass_payload + the 3-level test below)
      t0, t1   — a [t0, t1] interval containing every possible sample
    Misses composite to pure background with zero further work; hits
    are re-chunked densely and marched with per-ray ``t_range`` clipped
    to [t0, t1], so the main lattice's static span shrinks to the
    occupied chord actually seen by the frame.

    Works on the march's validity semantics only — any ray with >= 1
    valid march sample is guaranteed hit; a hit ray may still produce
    no samples (dilation slack).
    """
    if state.prepass_payload is None:
        raise ValueError(
            "ray_prepass needs state.prepass_payload "
            "(pack_prepass_payload / update_occupancy)"
        )
    N = rays_o.shape[0]
    H = cfg.grid_size
    cas = cfg.cascades
    F = COARSE_FACTOR
    Hc = H // F
    h = prepass_spacing(cfg)
    Kp = prepass_probes(cfg)
    dt_min, dt_max = dt_bounds(cfg)
    if aabb is None:
        aabb = jnp.asarray(cfg.aabb, jnp.float32)
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, cfg.min_near)
    hit_box = fars > nears
    ts = nears[:, None] + h * jnp.arange(Kp, dtype=jnp.float32)[None, :]
    # the mip level the MAIN march would use at this t (same formula;
    # dt is the march's clamp recurrence, not the prepass spacing)
    if cfg.dt_gamma == 0.0:
        dts = jnp.full_like(ts, dt_min)
    else:
        dts = jnp.clip(ts * cfg.dt_gamma, dt_min, dt_max)
    x = rays_o[:, None, :] + rays_d[:, None, :] * ts[..., None]
    x = jnp.clip(x, -cfg.bound, cfg.bound)

    def lookup_level(level):
        mip_bound = jnp.minimum(2.0 ** level.astype(jnp.float32), cfg.bound)
        n = jnp.clip(
            (0.5 * (x / mip_bound[..., None] + 1.0) * H).astype(jnp.int32),
            0, H - 1,
        )
        c = n // F
        flat = ((level * Hc + c[..., 0]) * Hc + c[..., 1]) * Hc + c[..., 2]
        return _coarse_lookup(state.prepass_payload, flat)

    if cas == 1:
        occ = lookup_level(jnp.zeros(ts.shape, jnp.int32))
    else:
        # a main sample within h/2 of this probe can sit one mip level
        # away (position/dt wobble across a power-of-2 boundary): test
        # the probe's own level and both neighbors
        level = jnp.maximum(mip_from_pos(x, cas), mip_from_dt(dts, H, cas))
        occ = lookup_level(level)
        occ = occ | lookup_level(jnp.maximum(level - 1, 0))
        occ = occ | lookup_level(jnp.minimum(level + 1, cas - 1))
    # a probe at t_p covers samples up to t_p + h/2; samples need
    # t < far, so probes beyond far + h/2 can't matter
    occ = occ & (ts <= fars[:, None] + 0.5 * h) & hit_box[:, None]
    hit = jnp.any(occ, axis=1)
    t0 = jnp.min(jnp.where(occ, ts, jnp.inf), axis=1) - 0.5 * h
    t1 = jnp.max(jnp.where(occ, ts, -jnp.inf), axis=1) + 0.5 * h
    t0 = jnp.where(hit, jnp.maximum(t0, nears), nears)
    t1 = jnp.where(hit, jnp.minimum(t1, fars), nears)
    return {"hit": hit, "t0": t0, "t1": t1, "nears": nears, "fars": fars}


def composite_rays(
    sigmas: jnp.ndarray,
    rgbs: jnp.ndarray,
    ts: jnp.ndarray,
    deltas: jnp.ndarray,
    mask: jnp.ndarray,
    nears: jnp.ndarray,
    fars: jnp.ndarray,
    density_scale: float = 1.0,
    t_thresh: float = 1e-4,
) -> Dict[str, jnp.ndarray]:
    """Masked front-to-back compositing over compacted samples.

    Equivalent of composite_rays_train fwd (raymarching.cu:501-588);
    early termination at transmittance < t_thresh becomes a mask (the
    contributions it skips are exactly the ones zeroed here). Depth is
    normalized to [0, 1] in [near, far] as the reference's staged path.
    """
    sigmas = sigmas.astype(jnp.float32)
    alphas = 1.0 - jnp.exp(-deltas * density_scale * sigmas)
    alphas = jnp.where(mask, alphas, 0.0)
    shifted = jnp.concatenate(
        [jnp.ones_like(alphas[..., :1]), 1.0 - alphas + 1e-15], axis=-1
    )
    trans = jnp.cumprod(shifted, axis=-1)[..., :-1]
    weights = jnp.where(trans > t_thresh, alphas * trans, 0.0)
    weights_sum = jnp.sum(weights, axis=-1)
    image = jnp.sum(weights[..., None] * rgbs.astype(jnp.float32), axis=-2)
    span = jnp.maximum(fars - nears, 1e-10)
    depth = jnp.sum(weights * jnp.clip((ts - nears[:, None]) / span[:, None], 0, 1), axis=-1)
    return {
        "weights": weights,
        "weights_sum": weights_sum,
        "image": image,
        "depth": depth,
    }


def render_rays_grid(
    density_fn: Callable,
    color_fn: Callable,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    state: OccupancyState,
    cfg: RenderConfig,
    rng: Optional[jax.Array] = None,
    perturb: bool = False,
    bg_color=None,
    bg_fn: Optional[Callable] = None,
    max_samples: Optional[int] = None,
    aabb: Optional[jnp.ndarray] = None,
    t_range: Optional[jnp.ndarray] = None,
    return_geo: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Full accelerated render: march → network → composite
    (run_cuda equivalent, renderer.py:256-321).

    ``return_geo=True``: also return the density_fn's geometry aux
    (out["geo"], [N, S, ...]) with its validity mask
    (out["compact_valid"], [N, S]) — same contract as the turbo
    renderer's compact-batch form, consumed by D-NeRF's deform
    regulariser (dnerf/utils.py:117-119)."""
    m = march_rays(
        rays_o, rays_d, state, cfg, rng=rng, perturb=perturb,
        max_samples=max_samples, aabb=aabb, t_range=t_range,
    )
    sigmas, geo = density_fn(m["xyzs"])
    rgbs = color_fn(m["dirs"], geo)
    out = composite_rays(
        sigmas, rgbs, m["ts"], m["deltas"], m["mask"], m["nears"], m["fars"],
        density_scale=cfg.density_scale, t_thresh=cfg.t_thresh,
    )
    if bg_fn is not None and cfg.bg_radius > 0:
        sph = sph_from_ray(rays_o, rays_d, cfg.bg_radius)
        bg = bg_fn(sph, rays_d)
    elif bg_color is None:
        bg = jnp.float32(1.0)
    else:
        bg = bg_color
    out["image"] = out["image"] + (1.0 - out["weights_sum"])[..., None] * bg
    out["n_samples"] = jnp.sum(m["mask"])
    out["ts"], out["deltas"] = m["ts"], m["deltas"]  # for distortion loss
    if return_geo:
        out["geo"] = geo
        out["compact_valid"] = m["mask"]
    return out


# ---------------------------------------------------------------------------
# turbo march (v2): matmul coarse test + crossing payloads + compaction
# ---------------------------------------------------------------------------

# t-bits sort keys (march_rays_turbo): positive-f32 bit patterns are
# monotone in the value, so selection keys carry t itself. Real t's
# bits stay below _TKEY_THRESH (0x50000000 = bits of 2^33); invalid
# probes add _TKEY_INVALID, landing in (_TKEY_THRESH, 0x7p...) without
# int32 overflow for any t < 2^33.
_TKEY_INVALID = 0x20000000
_TKEY_THRESH = 0x50000000


def _coarse_lookup(coarse_payload: jnp.ndarray, flatcell: jnp.ndarray) -> jnp.ndarray:
    """Occupancy bits for flat coarse-cell indices.

    On TPU this dispatches to the Pallas kernel
    (ops/pallas/march_kernels.py): lane-dense VMEM-resident lookup, 4 B
    in + 4 B out per probe (measured 0.95 ms vs 1.3-3.3 ms for the XLA
    one-hot form at 4.2 M probes). The XLA fallback below — a one-hot
    MXU matmul against the byte-packed pooled grid — remains the CPU /
    reference path (still far better than a gather: 3.3 ms vs 35 ms at
    4.2 M lookups; scripts/microbench_v2.py)."""
    import os

    if jax.default_backend() != "cpu" and not os.environ.get("NGP_NO_PALLAS_LOOKUP"):
        from ngp_tpu.ops.pallas.march_kernels import coarse_lookup_bits

        return coarse_lookup_bits(coarse_payload, flatcell)
    shape = flatcell.shape
    fc = flatcell.reshape(-1)
    byte_idx = fc >> 3
    bit = fc & 7
    hi = byte_idx >> 7
    lo = byte_idx & 127
    oh = jax.nn.one_hot(hi, coarse_payload.shape[0], dtype=jnp.bfloat16)
    vals = jnp.dot(oh, coarse_payload.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)  # [P, 128]
    oh_lo = jax.nn.one_hot(lo, 128, dtype=jnp.float32)
    byte = jnp.sum(vals * oh_lo, axis=-1).astype(jnp.int32)  # bytes are <= 255
    return (((byte >> bit) & 1) > 0).reshape(shape)


def march_rays_turbo(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    state: OccupancyState,
    cfg: RenderConfig,
    rng: Optional[jax.Array] = None,
    perturb: bool = False,
    max_samples: Optional[int] = None,
    aabb: Optional[jnp.ndarray] = None,
    t_range: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """TPU-native v2 of march_rays_train (raymarching.cu:312-490).

    Same t-lattice + occupancy semantics as :func:`march_rays`, but the
    per-probe occupancy test costs no random memory access:

    1. every lattice probe is tested against a 4^3-pooled coarse grid
       via a one-hot MXU matmul (``_coarse_lookup``);
    2. survivors are compacted per ray to ``cfg.coarse_candidates``;
    3. consecutive candidates sharing a coarse cell form a CROSSING;
       one 64-bit fine-occupancy payload row is gathered per crossing
       (<= cfg.crossing_slots rows/ray instead of one gather/probe)
       and each candidate extracts its fine bit in-register;
    4. fine-valid samples are compacted to the per-ray budget S.

    Crossing overflow (> crossing_slots distinct coarse cells) drops
    the farthest crossings — the reference's point-budget semantics
    (raymarching.py:198-203).

    Works for BOTH uniform (dt_gamma == 0) and adaptive
    (dt = clamp(t*dt_gamma, dt_min, dt_max), raymarching.cu:345-346)
    lattices. Every selection stage must carry its survivors' sample
    positions WITHOUT a positional gather (measured: a single
    take_along_axis at these shapes costs ~18 ms on v5e —
    tile-granularity scalar gathers). The trick: for positive floats
    the IEEE-754 bit pattern is monotone in the value, so the top_k /
    sort keys ARE the f32 bits of t itself — selection by march order
    and carrying t become the same operation, for ANY monotone lattice.
    Validity is encoded by adding _TKEY_INVALID (an int far above any
    real t's bits), and per-sample dt is recomputed from t by the
    clamp formula. The only dynamic indexing in the march remains the
    one fine-payload row gather per coarse-cell crossing.
    """
    if state.coarse_payload is None or state.fine_payload is None:
        raise ValueError(
            "march_rays_turbo needs packed payloads — build the state "
            "with pack_occupancy_payloads / update_occupancy"
        )
    S = max_samples or cfg.max_samples_per_ray
    S = min(S, cfg.max_steps)
    # probe lattice covers the full 2*sqrt(3)*bound chord (reference
    # skips don't consume the step budget, raymarching.cu:388-399)
    K = lattice_probes(cfg)
    assert K >= ALIGN, f"lattice too short ({K} probes)"
    K2 = max(min(cfg.coarse_candidates, K), ALIGN)
    # per-ray sample budget: can't exceed the candidate budget (samples
    # are a subset of candidates), and the turbo placement path
    # (place_compact) requires ALIGN-aligned budgets — round
    # caller-supplied budgets (e.g. the GUI 'max samples/ray' dial)
    S = max(ALIGN, min(-(-S // ALIGN) * ALIGN, K2 // ALIGN * ALIGN))
    U = cfg.crossing_slots
    N = rays_o.shape[0]
    H = cfg.grid_size
    cas = cfg.cascades
    F = COARSE_FACTOR
    Hc = H // F
    dt_min, dt_max = dt_bounds(cfg)
    if aabb is None:
        aabb = jnp.asarray(cfg.aabb, jnp.float32)
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, cfg.min_near)
    if t_range is not None:
        # per-ray eval-prepass clip (ray_prepass): the lattice starts
        # at the first possibly-occupied t, so the static probe span
        # only needs to cover the occupied chord, not the whole box
        nears = jnp.maximum(nears, t_range[:, 0])
        fars = jnp.minimum(fars, t_range[:, 1])
    hit = fars > nears
    fars_c = jnp.where(hit, fars, nears)

    noise = None
    if perturb and rng is not None:
        noise = jax.random.uniform(rng, (N,))
    ts, dts = t_lattice(nears, fars_c, cfg, noise)  # [N, K] (shared w/ v1)

    def dt_at(t):
        """Per-sample step size from t (identical expression to
        t_lattice's dt_of, so recomputed dts match the lattice's)."""
        if cfg.dt_gamma == 0.0:
            return jnp.full_like(t, dt_min)
        return jnp.clip(t * cfg.dt_gamma, dt_min, dt_max)

    def cells_at(ts_, dts_):
        """Fine cell coords + flat coarse id at t values [N, k]."""
        x = rays_o[:, None, :] + rays_d[:, None, :] * ts_[..., None]
        x = jnp.clip(x, -cfg.bound, cfg.bound)
        level = jnp.maximum(mip_from_pos(x, cas), mip_from_dt(dts_, H, cas))
        mip_bound = jnp.minimum(2.0 ** level.astype(jnp.float32), cfg.bound)
        n = jnp.clip(
            (0.5 * (x / mip_bound[..., None] + 1.0) * H).astype(jnp.int32),
            0, H - 1,
        )
        coarse = n // F
        flat = ((level * Hc + coarse[..., 0]) * Hc + coarse[..., 1]) * Hc + coarse[..., 2]
        return n, flat

    _, flat_c = cells_at(ts, dts)
    coarse_ok = _coarse_lookup(state.coarse_payload, flat_c)
    valid_c = coarse_ok & (ts < fars_c[:, None]) & hit[:, None]

    # per-ray compaction of coarse survivors to K2 candidates; the
    # top_k VALUE carries t's own f32 bits (no position gather).
    # tbits is monotone in t for t >= 0; real t's bits stay below
    # _TKEY_THRESH (t < 2^33), invalid keys land above it.
    tbits = jax.lax.bitcast_convert_type(ts, jnp.int32)
    key = jnp.where(valid_c, tbits, tbits + _TKEY_INVALID)
    negv, _ = jax.lax.top_k(-key, K2)
    cand = -negv  # [N, K2] ascending-t keys
    cmask = cand < _TKEY_THRESH
    tbits2 = jnp.where(cmask, cand, cand - _TKEY_INVALID)
    ts2 = jax.lax.bitcast_convert_type(tbits2, jnp.float32)
    dts2 = dt_at(ts2)
    n2, flat2 = cells_at(ts2, dts2)

    # crossings: runs of consecutive candidates in the same coarse cell
    change = jnp.concatenate(
        [jnp.ones((N, 1), bool), flat2[:, 1:] != flat2[:, :-1]], axis=1
    ) & cmask
    slot = jnp.cumsum(change.astype(jnp.int32), axis=1) - 1  # [N, K2]
    in_budget = slot < U
    slot_cl = jnp.clip(slot, 0, U - 1)
    # match on the UNCLAMPED slot: overflow crossings must not alias
    # into slot U-1 (that would corrupt its payload cell id)
    oh_first = (slot[:, :, None] == jnp.arange(U)[None, None, :]) & change[:, :, None]
    slot_cell = jnp.max(
        jnp.where(oh_first, flat2[:, :, None], -1), axis=1
    )  # [N, U] first coarse cell per slot (-1 unused)
    pay = jnp.take(
        state.fine_payload, jnp.maximum(slot_cell, 0).reshape(-1), axis=0
    ).reshape(N, U, -1)
    # split the two u32 payload words into 8 bytes (exact in bf16) and
    # route them to candidates with a one-hot einsum over slots — a
    # take_along_axis here costs ~18 ms, the einsum < 1 ms
    shifts8 = jnp.arange(4, dtype=jnp.uint32) * 8
    b0 = (pay[..., 0][..., None] >> shifts8[None, None, :]) & 0xFF
    b1 = (pay[..., 1][..., None] >> shifts8[None, None, :]) & 0xFF
    pay_bytes = jnp.concatenate([b0, b1], axis=-1).astype(jnp.bfloat16)  # [N, U, 8]
    oh_slot = jax.nn.one_hot(slot_cl, U, dtype=jnp.bfloat16)  # [N, K2, U]
    bytes_k = jnp.einsum(
        "nku,nub->nkb", oh_slot, pay_bytes,
        preferred_element_type=jnp.float32,
    )  # [N, K2, 8]
    off = n2 % F
    bit6 = (off[..., 0] * F + off[..., 1]) * F + off[..., 2]  # [N, K2] in [0, 64)
    oh_byte = jax.nn.one_hot(bit6 >> 3, 8, dtype=jnp.float32)
    byte_val = jnp.sum(bytes_k * oh_byte, axis=-1).astype(jnp.int32)  # [N, K2]
    fine_ok = ((byte_val >> (bit6 & 7)) & 1) > 0
    valid_f = fine_ok & cmask & in_budget
    # per-ray fine-occupancy pass rate of the candidates that WERE
    # fine-tested — the calibration factor for the overflow estimate
    # below (budget-dropped candidates never had their payload
    # gathered; assuming they all would have passed overstates drops
    # 2-4x: a converged scene read 0.27-0.32 "dropped" at rest)
    n_tested = jnp.sum(cmask & in_budget, axis=-1)
    fine_rate = jnp.sum(valid_f, axis=-1) / jnp.maximum(n_tested, 1)

    if cfg.t_proxy_thresh is not None and state.fine_payload.shape[1] >= 18:
        # transmittance-proxy early-out: accumulate estimated optical
        # depth from each candidate's OWN fine cell's log-quantized
        # density (payload words 2-17) along the t-ordered candidates
        # (cand is ascending-t by construction); candidates behind an
        # estimated-opaque prefix never become samples — the reference
        # inference loop's dead-ray early termination
        # (raymarching.cu:834-850) expressed as a mask, so the global
        # sample budget flows to VISIBLE samples instead of occluded
        # ones. The packed codes are ERODED (3^3 min-pool) densities —
        # see pack_occupancy_payloads: both a 4^3 max-pool variant AND
        # raw per-cell EMA-max densities made grazing rays accumulate
        # phantom optical depth from boundary cells and culled real
        # content behind them (PSNR 35 -> 15-17 measured on the hard
        # scene). Eroded codes underestimate, so the threshold can sit
        # at the exact composite's t_thresh (e.g. 1e-4).
        shifts8u = jnp.arange(4, dtype=jnp.uint32) * 8
        codes = (
            (pay[..., 2:18][..., None] >> shifts8u[None, None, None, :])
            & 0xFF
        ).reshape(N, U, 64).astype(jnp.bfloat16)  # u8 codes exact in bf16
        codes_k = jnp.einsum(
            "nku,nub->nkb", oh_slot, codes,
            preferred_element_type=jnp.float32,
        )  # [N, K2, 64] this candidate's crossing-cell code vector
        oh_cell = jax.nn.one_hot(bit6, 64, dtype=jnp.float32)
        code_k = jnp.sum(codes_k * oh_cell, axis=-1)  # [N, K2]
        dens_k = jnp.where(
            code_k > 0.0, jnp.exp2(code_k / 8.0 - 16.0), 0.0
        )
        contrib = jnp.where(
            valid_f, dens_k * cfg.density_scale * dts2, 0.0
        )
        cum = jnp.cumsum(contrib, axis=1) - contrib  # exclusive prefix
        alive = cum < -math.log(cfg.t_proxy_thresh)
        valid_f = valid_f & alive

    # final per-ray compaction to S samples, again t-bits keys
    key2 = jnp.where(valid_f, tbits2, tbits2 + _TKEY_INVALID)
    negv2, _ = jax.lax.top_k(-key2, S)
    sel = -negv2  # [N, S] ascending-t keys; valid entries first
    n_total = jnp.sum(valid_f, axis=-1)
    mask = jnp.arange(S, dtype=jnp.int32)[None, :] < n_total[:, None]
    # within the mask every key is a real t's bits; masked slots decode
    # to t = 0.0 (bits 0)
    ts_c = jax.lax.bitcast_convert_type(
        jnp.where(mask, sel, 0), jnp.float32
    )
    dts_c = jnp.where(mask, dt_at(ts_c), 0.0)

    # overflow observability (VERDICT r2/r3): estimated would-be
    # samples dropped by the coarse-candidate / crossing-slot budgets
    # (drops are far-first, so this is the quality-relevant signal).
    # CALIBRATED (round 4): candidates dropped before the fine test
    # never had their payload gathered, so they are scaled by the
    # ray's measured fine-pass rate instead of counted whole — the raw
    # upper bound read 0.27-0.32 on a converged healthy scene (useless
    # as an alarm); the calibrated estimate reads ~0.1 there and
    # 0.4-0.5 on a genuinely underbudgeted run (error-map-concentrated
    # batches), which is what the trainer's warning thresholds on.
    n_coarse = jnp.sum(valid_c, axis=-1)  # lattice points that passed coarse
    n_kept_c = jnp.sum(cmask, axis=-1)  # after the K2 candidate budget
    untested = (
        (n_coarse - n_kept_c)  # coarse-candidate budget drops
        + jnp.sum(cmask & ~in_budget, axis=-1)  # crossing-budget drops
    )
    dropped = (
        untested.astype(jnp.float32) * fine_rate
        + jnp.maximum(n_total - S, 0)  # per-ray sample budget (fine-tested)
    )

    xyzs = rays_o[:, None, :] + rays_d[:, None, :] * ts_c[..., None]
    xyzs = jnp.clip(xyzs, -cfg.bound, cfg.bound)
    dirs = jnp.broadcast_to(rays_d[:, None, :], xyzs.shape)
    return {
        "xyzs": xyzs,
        "dirs": dirs,
        "ts": ts_c,
        "deltas": dts_c,
        "mask": mask,
        "nears": nears,
        "fars": fars,
        "n_total": n_total,
        "n_dropped": dropped,  # [N] budget-overflow counter (see above)
    }


def compact_valid_samples(
    mask: jnp.ndarray, budget: int, extra=None, block_uniform: bool = False
):
    """Squeeze the valid PREFIX samples of [N, S] rays into a global
    [budget] buffer, ray-major (the TPU replacement for the CUDA
    atomicAdd point packing, raymarching.cu:405-414).

    Returns (src, valid, offsets[, extra_c]): compact slot m holds
    march slot src[m] (flat N*S index); offsets[n] is ray n's first
    compact slot; ``extra`` [N, S] rides the sort as a payload operand
    (free — no gather needed to compact it). A ray straddling the
    budget keeps its in-budget prefix (the caller's
    ``offsets + s < budget`` mask renders that prefix and drops the
    rest); rays entirely past the budget contribute nothing — the
    reference's point buffer fills mid-ray the same way
    (raymarching.cu:405-414 allocates what remains, short rays).

    ``block_uniform=True`` (static) promises the mask is constant
    within each ALIGN-sample block (true for the ALIGN-padded masks
    `_turbo_compact_geometry` builds) and ``budget % ALIGN == 0``: the
    sort then runs at BLOCK granularity — 4x fewer rows, and TPU sort
    cost is per-row — with the ``extra`` payload riding as ALIGN
    strided operands. Bit-identical output to the general path on
    block-uniform masks (tested).
    """
    N, S = mask.shape
    counts = jnp.sum(mask, axis=1)
    offsets = (jnp.cumsum(counts) - counts).astype(jnp.int32)
    if block_uniform and S % ALIGN == 0 and budget % ALIGN == 0:
        NB = N * (S // ALIGN)
        flatb = mask.reshape(NB, ALIGN)[:, 0]
        iota_b = jnp.arange(NB, dtype=jnp.int32)
        keys = jnp.where(flatb, iota_b, NB + iota_b)
        ops = (keys, iota_b)
        if extra is not None:
            ex = extra.reshape(NB, ALIGN)
            ops = ops + tuple(ex[:, j] for j in range(ALIGN))
        sorted_ops = jax.lax.sort(ops, num_keys=1)
        Bb = budget // ALIGN
        sub = jnp.arange(ALIGN, dtype=jnp.int32)[None, :]
        src = (sorted_ops[1][:Bb, None] * ALIGN + sub).reshape(-1)
        valid = jnp.repeat(sorted_ops[0][:Bb] < NB, ALIGN)
        if extra is None:
            return src, valid, offsets
        extra_c = jnp.stack(
            [sorted_ops[2 + j][:Bb] for j in range(ALIGN)], axis=1
        ).reshape(-1)
        return src, valid, offsets, extra_c
    flat = mask.reshape(-1)
    iota = jnp.arange(N * S, dtype=jnp.int32)
    keys = jnp.where(flat, iota, N * S + iota)
    ops = (keys, iota) if extra is None else (keys, iota, extra.reshape(-1))
    sorted_ops = jax.lax.sort(ops, num_keys=1)
    skeys = sorted_ops[0]
    src = sorted_ops[1][:budget]
    valid = skeys[:budget] < N * S
    if extra is None:
        return src, valid, offsets
    return src, valid, offsets, sorted_ops[2][:budget]


ALIGN = 4  # compact segment alignment: placement rows are ALIGN*F lanes
# (4 keeps dummy-sample inflation low while rows stay cheap to gather)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def place_compact(vals, offsets, src, S: int):
    """Place per-compact-sample values [M, F] back into [N, S, F] ray
    slots. Requires ALIGN-aligned segments (offsets % ALIGN == 0, from
    compacting an ALIGN-padded mask): both directions are then genuine
    ROW gathers over [*, ALIGN*F]-wide rows — an element-level
    formulation costs ~15 ns per ELEMENT on TPU (every scalar gather
    moves a 4 KB tile), ~12 ms at production shapes; the row form is
    < 1 ms. Backward
    gathers at block granularity via ``src`` — the compact-slot ->
    (ray, slot) map is injective, so no scatter is ever needed.
    Slots beyond a ray's count (or past the budget) contain garbage and
    MUST be masked by the caller (the march mask already is that mask).
    """
    return _place_fwd_impl(vals, offsets, src, S)


def _place_fwd_impl(vals, offsets, src, S):
    M, Fd = vals.shape
    N = offsets.shape[0]
    v8 = vals.reshape(M // ALIGN, ALIGN * Fd)
    rows = offsets[:, None] // ALIGN + jnp.arange(S // ALIGN, dtype=jnp.int32)[None, :]
    out = jnp.take(v8, rows.reshape(-1), axis=0, mode="clip")
    return out.reshape(N, S, Fd)


def _place_fwd(vals, offsets, src, S):
    return _place_fwd_impl(vals, offsets, src, S), (offsets, src, vals.shape)


def _place_bwd(S, res, g):
    offsets, src, vshape = res
    M, Fd = vshape
    N = offsets.shape[0]
    nb = M // ALIGN
    g8 = g.reshape(N * (S // ALIGN), ALIGN * Fd)
    ray_b = src[::ALIGN] // S  # ray of each compact block
    j_b = jnp.arange(nb, dtype=jnp.int32) - offsets[ray_b] // ALIGN
    row_b = ray_b * (S // ALIGN) + jnp.clip(j_b, 0, S // ALIGN - 1)
    dv8 = jnp.take(g8, row_b, axis=0, mode="clip")
    # blocks outside their ray's segment feed only masked output -> 0
    in_seg = (j_b >= 0) & (j_b < S // ALIGN)
    dvals = jnp.where(in_seg[:, None], dv8, 0.0).reshape(M, Fd)
    return dvals, None, None


place_compact.defvjp(_place_fwd, _place_bwd)


def _turbo_compact_geometry(
    rays_o, rays_d, state, cfg, rng, perturb, max_samples, aabb, budget,
    t_range=None,
):
    """Shared turbo-render prologue: march -> ALIGN-padded valid-sample
    compaction -> per-compact-sample geometry rebuild.

    Compacts an ALIGN-padded mask (each ray's sample count rounded up
    to a block) so placement is a pure row gather; per-sample t rides
    the compaction sort as a payload operand; per-sample geometry is
    then rebuilt from ONE block-level ray-row gather + arithmetic
    (every extra per-sample gather costs ~3-5 ms at this shape).

    A scarce EXPLICIT budget (eval frame rendering) is WATER-FILLED:
    every ray gets the same per-ray depth allowance k* = max { k :
    sum_n min(count_n, k) <= budget } (k* a multiple of ALIGN), so
    overflow drops the DEEPEST samples of the longest rays — usually
    occluded — instead of whole trailing rays. Measured at 800x800
    eval: tail-drop collapses small-budget renders (16-20 dB at budget
    4/ray with 32-sample rays) where water-filling stays within ~0.4 dB
    of the unconstrained render. TRAINING budgets (budget=None -> the
    compact_mean_samples cap) keep the reference's ray-major tail-drop
    (raymarching.py:198-203, raymarching.cu:405-414) ON PURPOSE: the
    random rays that keep their full depth are what teach far content
    while the early-training grid is still dense — water-filling there
    truncates EVERY ray at the same shallow k* and measurably hurts
    convergence (-2.7 dB at 1k steps on the synthetic scene).

    Returns (march_dict, S, budget, src, valid, offsets, t_compact,
    pts [M, 3], dirs [M, 3], maskb [N, S]) where maskb additionally
    masks samples truncated by the allowance/budget."""
    N = rays_o.shape[0]
    m = march_rays_turbo(
        rays_o, rays_d, state, cfg, rng=rng, perturb=perturb,
        max_samples=max_samples, aabb=aabb, t_range=t_range,
    )
    S = m["mask"].shape[1]
    water_fill = budget is not None  # explicit (eval) budgets only
    if budget is None:
        budget = N * cfg.compact_mean_samples
    budget = min(budget, N * S)
    n_total8 = jnp.minimum((m["n_total"] + ALIGN - 1) // ALIGN * ALIGN, S)
    if water_fill and budget < N * S:
        ks = jnp.arange(0, S + 1, ALIGN, dtype=jnp.int32)  # candidate caps
        tot = jnp.sum(
            jnp.minimum(n_total8[None, :], ks[:, None]), axis=1
        )  # [len(ks)] monotone in k
        # floor of one ALIGN block: at pathological budgets (< ALIGN x
        # nonempty rays) water-filling alone would render NOTHING; the
        # ray-major budget mask below then truncates the tail instead
        # (the reference's buffer-fill behavior, on a 1-block allowance)
        k_star = jnp.maximum(jnp.max(jnp.where(tot <= budget, ks, 0)), ALIGN)
        # distribute the leftover budget (< one ALIGN step of the water
        # level) as one extra block to the first rays still truncated —
        # without this the k* quantization strands up to N*ALIGN slots
        # (measured -0.26 dB at near-sufficient eval budgets)
        tot_k = jnp.sum(jnp.minimum(n_total8, k_star))
        wants = n_total8 > k_star
        rank = jnp.cumsum(wants.astype(jnp.int32)) - 1
        extra_blocks = jnp.maximum(budget - tot_k, 0) // ALIGN
        bonus = ALIGN * (wants & (rank < extra_blocks)).astype(jnp.int32)
        n_alloc = jnp.minimum(n_total8, k_star + bonus)
    else:
        n_alloc = n_total8
    mask8 = jnp.arange(S, dtype=jnp.int32)[None, :] < n_alloc[:, None]
    # n_alloc is a multiple of ALIGN by construction (n_total8, k_star
    # and bonus all are), so mask8 is block-uniform -> block-level sort
    src, valid_m, offsets, t_c = compact_valid_samples(
        mask8, budget, extra=m["ts"], block_uniform=True
    )
    ray_row = jnp.concatenate(
        [rays_o, rays_d, jnp.zeros((N, 2), jnp.float32)], axis=-1
    )  # [N, 8]
    ray_b = src[::ALIGN] // S  # per compact block (segments ALIGN-aligned)
    rr = jnp.repeat(jnp.take(ray_row, ray_b, axis=0), ALIGN, axis=0)  # [M, 8]
    pts = jnp.clip(
        rr[:, 0:3] + rr[:, 3:6] * t_c[:, None], -cfg.bound, cfg.bound
    )  # [M, 3]
    dirs = rr[:, 3:6]
    iota_s = jnp.arange(S, dtype=jnp.int32)[None, :]
    maskb = (
        m["mask"]
        & (iota_s < n_alloc[:, None])  # water-filled per-ray allowance
        & ((offsets[:, None] + iota_s) < budget)  # binds only below the floor
    )
    return m, S, budget, src, valid_m, offsets, t_c, pts, dirs, maskb


def render_rays_grid_turbo_multi(
    sigma_rgb_fn: Callable,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    state: OccupancyState,
    cfg: RenderConfig,
    rng: Optional[jax.Array] = None,
    perturb: bool = False,
    bg_color=None,
    max_samples: Optional[int] = None,
    aabb: Optional[jnp.ndarray] = None,
    budget: Optional[int] = None,
) -> Dict[str, jnp.ndarray]:
    """Turbo render with K stacked radiance heads sharing ONE march.

    ``sigma_rgb_fn(pts [M, 3], dirs [M, 3]) -> (sigmas [K, M],
    rgbs [K, M, 3])`` evaluates every head on the compact sample batch;
    each head is placed and composited into its own image. This is the
    CCNeRF residual-training forward (the reference composites each
    rank prefix into its own image over shared march samples,
    nerf/renderer.py:298-311 + tensoRF/utils.py:529-531) on the
    flagship matmul-march path: the march, compaction and placement
    maps are K-independent, so only the [K, M, 4] value tensor and the
    [K, N, S] composite scale with K.

    Returns {"image": [K, N, 3], "weights_sum": [K, N], "depth":
    [K, N], ...} plus the budget-overflow counters of the single-head
    path."""
    m, S, budget, src, valid_m, offsets, t_c, pts, dirs, maskb = (
        _turbo_compact_geometry(
            rays_o, rays_d, state, cfg, rng, perturb, max_samples, aabb,
            budget,
        )
    )
    sigmas, rgbs = sigma_rgb_fn(pts, dirs)  # [K, M], [K, M, 3]
    vals = jnp.concatenate(
        [sigmas[..., None].astype(jnp.float32), rgbs.astype(jnp.float32)],
        axis=-1,
    )  # [K, M, 4]
    placed = jax.vmap(lambda v: place_compact(v, offsets, src, S))(vals)

    def comp(p):
        return composite_rays(
            p[..., 0], p[..., 1:], m["ts"], m["deltas"], maskb,
            m["nears"], m["fars"],
            density_scale=cfg.density_scale, t_thresh=cfg.t_thresh,
        )

    out = jax.vmap(comp)(placed)
    bg = jnp.float32(1.0) if bg_color is None else bg_color
    out["image"] = out["image"] + (1.0 - out["weights_sum"])[..., None] * bg
    out["n_samples"] = jnp.sum(maskb)
    out["n_dropped"] = jnp.sum(m["n_dropped"]) + jnp.sum(m["mask"] & ~maskb)
    return out


def render_rays_grid_turbo(
    density_fn: Callable,
    color_fn: Callable,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    state: OccupancyState,
    cfg: RenderConfig,
    rng: Optional[jax.Array] = None,
    perturb: bool = False,
    bg_color=None,
    bg_fn: Optional[Callable] = None,
    max_samples: Optional[int] = None,
    aabb: Optional[jnp.ndarray] = None,
    budget: Optional[int] = None,
    return_geo: bool = False,
    t_range: Optional[jnp.ndarray] = None,
    vals_fn: Optional[Callable] = None,
) -> Dict[str, jnp.ndarray]:
    """Accelerated render v2: turbo march -> global valid-sample
    compaction -> network on the compact batch -> windowed placement ->
    masked compositing. Functionally the run_cuda path
    (renderer.py:256-321) with the reference's point-budget semantics.

    ``return_geo=True`` additionally returns the density_fn's geometry
    aux for the COMPACT batch (out["geo"], [budget, ...]) with its
    validity mask (out["compact_valid"], [budget]) — D-NeRF's deform
    regulariser (dnerf/utils.py:117-119) consumes the per-sample
    deformation this way.

    ``vals_fn(pts, dirs) -> [M, 4] f32`` (eval only): a fused
    sigma+rgb evaluation replacing the density_fn/color_fn pair AND
    the concat — the flagship's one-kernel radiance head
    (models/nerf.make_fused_sigma_rgb). Incompatible with return_geo
    (no geometry aux exists).
    """
    m, S, budget, src, valid_m, offsets, t_c, pts, dirs, maskb = (
        _turbo_compact_geometry(
            rays_o, rays_d, state, cfg, rng, perturb, max_samples, aabb,
            budget, t_range=t_range,
        )
    )
    if vals_fn is not None:
        if return_geo:
            raise ValueError("vals_fn is incompatible with return_geo")
        vals = vals_fn(pts, dirs)  # [M, 4] f32
        geo = None
    else:
        sigmas, geo = density_fn(pts)
        rgbs = color_fn(dirs, geo)
        vals = jnp.concatenate(
            [sigmas.reshape(-1, 1).astype(jnp.float32),
             rgbs.astype(jnp.float32)],
            axis=-1,
        )  # [M, 4]
    placed = place_compact(vals, offsets, src, S)  # [N, S, 4]
    out = composite_rays(
        placed[..., 0], placed[..., 1:], m["ts"], m["deltas"], maskb,
        m["nears"], m["fars"],
        density_scale=cfg.density_scale, t_thresh=cfg.t_thresh,
    )
    if bg_fn is not None and cfg.bg_radius > 0:
        sph = sph_from_ray(rays_o, rays_d, cfg.bg_radius)
        bg = bg_fn(sph, rays_d)
    elif bg_color is None:
        bg = jnp.float32(1.0)
    else:
        bg = bg_color
    out["image"] = out["image"] + (1.0 - out["weights_sum"])[..., None] * bg
    out["n_samples"] = jnp.sum(maskb)
    # budget-overflow observability: march budget drops (candidate /
    # crossing / per-ray-S, far-first) + global-budget truncation here
    out["n_dropped"] = jnp.sum(m["n_dropped"]) + jnp.sum(m["mask"] & ~maskb)
    out["ts"], out["deltas"] = m["ts"], m["deltas"]  # for distortion loss
    if return_geo:
        out["geo"] = geo
        out["compact_valid"] = valid_m
    return out


def render_rays_grid_turbo_direct(
    density_fn: Callable,
    color_fn: Callable,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    state: OccupancyState,
    cfg: RenderConfig,
    bg_color=None,
    max_samples: Optional[int] = None,
    aabb: Optional[jnp.ndarray] = None,
    t_range: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Eval-only turbo render WITHOUT global compaction: the network
    runs on the march's [N, S] slots directly (masked slots included)
    and compositing consumes the march output in place.

    Rationale (round-4 inference bisect): the compaction sort over
    N*S keys is the render's only super-linearly-scaling stage — it
    forces 4096-ray chunks, and at ~0.3 ms of lax.map per-iteration
    overhead x ~100 chunks the LOOP itself costs ~30 ms/frame at
    800x800. With a STATIC per-ray cap (``max_samples``, e.g. the
    water-fill level the budget would have produced) the march's
    ascending-t prefix IS the compaction: no sort, no placement, huge
    chunks become safe, and the padding waste is bounded by chunking
    rays into span buckets (the eval prepass knows each ray's occupied
    chord). Training keeps the compacted path: its budget semantics
    (ray-major tail drop) and the backward both want the compact batch.
    The reference's inference loop equivalent is the same observation —
    it caps per-ray steps at n_step and lets dead rays idle
    (renderer.py:336-367) rather than re-packing the batch.
    """
    m = march_rays_turbo(
        rays_o, rays_d, state, cfg, max_samples=max_samples, aabb=aabb,
        t_range=t_range,
    )
    N, S = m["mask"].shape
    pts = m["xyzs"].reshape(N * S, 3)
    dirs = m["dirs"].reshape(N * S, 3)
    sigmas, geo = density_fn(pts)
    rgbs = color_fn(dirs, geo)
    out = composite_rays(
        sigmas.reshape(N, S), rgbs.reshape(N, S, 3), m["ts"], m["deltas"],
        m["mask"], m["nears"], m["fars"],
        density_scale=cfg.density_scale, t_thresh=cfg.t_thresh,
    )
    bg = jnp.float32(1.0) if bg_color is None else bg_color
    out["image"] = out["image"] + (1.0 - out["weights_sum"])[..., None] * bg
    out["n_samples"] = jnp.sum(m["mask"])
    out["n_dropped"] = jnp.sum(m["n_dropped"])
    out["ts"], out["deltas"] = m["ts"], m["deltas"]
    return out


# ---------------------------------------------------------------------------
# density-grid maintenance
# ---------------------------------------------------------------------------


def _cascade_query_points(
    coords: jnp.ndarray, cas: int, cfg: RenderConfig, rng: jax.Array
) -> jnp.ndarray:
    """Cell coords [N, 3] in [0, H) → jittered world points in cascade
    (renderer.py:470-478)."""
    H = cfg.grid_size
    bound = min(2.0**cas, cfg.bound)
    half = bound / H
    xyzs = 2.0 * coords.astype(jnp.float32) / (H - 1) - 1.0
    xyzs = xyzs * (bound - half)
    jitter = (jax.random.uniform(rng, xyzs.shape) * 2.0 - 1.0) * half
    return xyzs + jitter


def update_occupancy(
    state: OccupancyState,
    density_fn: Callable,
    cfg: RenderConfig,
    rng: jax.Array,
    decay: float = 0.95,
    density_scale: float = 1.0,
) -> OccupancyState:
    """EMA-max density grid refresh + re-threshold
    (update_extra_state, renderer.py:445-536). jit-compatible: the
    full-vs-partial choice is a lax.cond on iter_density.

    Partial updates sample H^3/2 random cells per cascade (the
    reference refreshes H^3/4 random + H^3/4 resampled-occupied cells;
    uniform refresh of the same budget is shape-static and converges to
    the same EMA fixed point).
    """
    H = cfg.grid_size
    cas = cfg.cascades

    def query_cells(coords, c, key):
        pts = _cascade_query_points(coords, c, cfg, key)
        sigma, _ = density_fn(pts)
        return sigma.astype(jnp.float32) * density_scale

    def full_update(key):
        tmp = []
        xx, yy, zz = jnp.meshgrid(
            jnp.arange(H), jnp.arange(H), jnp.arange(H), indexing="ij"
        )
        coords = jnp.stack([xx, yy, zz], axis=-1).reshape(-1, 3)
        # chunk via lax.map: compiles the query body once instead of
        # inlining an H^3-point graph (kind to the compiler; the
        # reference's S=128 chunk loop serves the same purpose,
        # renderer.py:456-462)
        n_chunks = max(1, (H**3) // (128 * 128 * 8))
        coords_c = coords.reshape(n_chunks, -1, 3)
        for c in range(cas):
            key, k = jax.random.split(key)
            keys = jax.random.split(k, n_chunks)
            sig = jax.lax.map(
                lambda ck: query_cells(ck[0], c, ck[1]), (coords_c, keys)
            )
            tmp.append(sig.reshape(H, H, H))
        return jnp.stack(tmp)

    def partial_update(key):
        # Refresh a random contiguous x-slab of H/4 planes per cascade
        # (~the reference's H^3/4-cell budget, renderer.py:488-514).
        # TPU-first divergence: the reference refreshes RANDOM cells +
        # resampled occupied cells via scatter; scatters serialize on
        # TPU, so we sweep rotating slabs with dynamic_update_slice —
        # same refresh budget and the same EMA fixed point, fully
        # vectorized. Jittered cell-center queries are identical.
        thickness = max(H // 4, 1)
        tmp = jnp.full((cas, H, H, H), -1.0, jnp.float32)
        yz = jnp.meshgrid(jnp.arange(thickness), jnp.arange(H), jnp.arange(H), indexing="ij")
        base = jnp.stack(yz, axis=-1).reshape(-1, 3)  # x-local coords
        for c in range(cas):
            key, kx, kq = jax.random.split(key, 3)
            x0 = jax.random.randint(kx, (), 0, H - thickness + 1)
            coords = base.at[:, 0].add(x0)
            sig = query_cells(coords, c, kq).reshape(thickness, H, H)
            tmp = jax.lax.dynamic_update_slice(tmp, sig[None], (c, x0, 0, 0))
        return tmp

    tmp_grid = jax.lax.cond(
        state.iter_density < 16, full_update, partial_update, rng
    )

    valid = (state.density_grid >= 0) & (tmp_grid >= 0)
    new_grid = jnp.where(
        valid, jnp.maximum(state.density_grid * decay, tmp_grid), state.density_grid
    )
    mean_density = jnp.mean(jnp.maximum(new_grid, 0.0))
    thresh = jnp.minimum(mean_density, cfg.density_thresh)
    occ = new_grid > thresh
    coarse_payload, fine_payload = pack_occupancy_payloads(occ, new_grid)
    return OccupancyState(
        density_grid=new_grid,
        occ_grid=occ,
        mean_density=mean_density,
        iter_density=state.iter_density + 1,
        coarse_payload=coarse_payload,
        fine_payload=fine_payload,
        prepass_payload=pack_prepass_payload(occ),
    )


def mark_untrained_grid(
    state: OccupancyState,
    poses: jnp.ndarray,
    intrinsics: jnp.ndarray,
    H_img: int,
    W_img: int,
    cfg: RenderConfig,
) -> OccupancyState:
    """Set cells visible from NO training camera to -1
    (renderer.py:380-442); they can then never become occupied.

    A cell is 'visible' if its center projects inside some camera's
    image plane in front of the camera (the reference additionally
    keeps a half-grid margin; reproduced via the cell radius term).

    The visibility math is pure geometry and runs ONCE at startup, so
    it is staged entirely in host numpy (per CLAUDE.md, eager jnp
    dispatch through the remote-TPU tunnel costs seconds PER OP; the
    previous chunked-eager form cost ~16 x cascades tunnel round
    trips). One bool [CAS, H^3] mask transfers at the end.
    """
    Hg = cfg.grid_size
    cas = cfg.cascades
    intr = np.asarray(intrinsics, np.float32)
    fx, fy, cx, cy = float(intr[0]), float(intr[1]), float(intr[2]), float(intr[3])
    poses_np = np.asarray(poses, np.float32)
    rot = poses_np[:, :3, :3]  # [P, 3, 3] cam2world
    trans = poses_np[:, :3, 3]  # [P, 3]

    idx = np.arange(Hg, dtype=np.float32)
    base = np.stack(
        np.meshgrid(idx, idx, idx, indexing="ij"), axis=-1
    ).reshape(-1, 3)
    base = 2.0 * base / (Hg - 1) - 1.0  # [M, 3] in [-1, 1]

    vis_all = np.empty((cas, Hg, Hg, Hg), np.bool_)
    for c in range(cas):
        bound = min(2.0**c, cfg.bound)
        half = bound / Hg
        pts = base * (bound - half)  # [M, 3] cell centers
        visible = np.zeros(pts.shape[0], np.bool_)
        for p in range(poses_np.shape[0]):
            # world -> camera: pose is cam2world; invert rigidly
            cam = (pts - trans[p]) @ rot[p]  # R^T (x - t)
            z = cam[:, 2]
            # reference test (renderer.py:418-428): |x_cam| inside the
            # half-FOV extent at depth z plus a FULL-cell world margin —
            # 2*half_grid_size, so boundary-visible cells are never
            # permanently culled
            visible |= (
                (z > 0.01)
                & (np.abs(cam[:, 0]) < cx / fx * z + 2 * half)
                & (np.abs(cam[:, 1]) < cy / fy * z + 2 * half)
            )
        vis_all[c] = visible.reshape(Hg, Hg, Hg)

    new_grid = jnp.where(
        jnp.asarray(vis_all), state.density_grid, jnp.float32(-1.0)
    )
    return state.replace(density_grid=new_grid)

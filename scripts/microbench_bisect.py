#!/usr/bin/env python
"""Bisect the turbo render forward cost on TPU."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, n=20):
    out = fn(0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(1, n + 1):
        out = fn(i)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:56s} {dt*1e3:9.3f} ms/call")
    return dt


def main():
    from ngp_tpu.config import RenderConfig
    from ngp_tpu.models import occupancy as om
    from ngp_tpu.ops.cpgrid import CPGridConfig, cpgrid_encode

    N, S = 16384, 32
    render_cfg = RenderConfig(
        bound=1.0, min_near=0.05, dt_gamma=0.0, max_steps=256,
        max_samples_per_ray=32, grid_size=128, density_thresh=10.0,
        turbo=True, coarse_candidates=96, crossing_slots=16,
        compact_mean_samples=16,
    )
    rng = np.random.default_rng(0)
    POOL = 4
    ro = np.tile(np.array([[0, 0, -2.0]], np.float32), (POOL, N, 1))
    d = rng.normal(size=(POOL, N, 3)).astype(np.float32)
    d[..., 2] = np.abs(d[..., 2]) + 1.5
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ro = jnp.asarray(ro); rd = jnp.asarray(d)

    state = om.init_occupancy(render_cfg)
    occ = jnp.asarray(rng.random((1, 128, 128, 128)) < 0.05)
    cp, fp = om.pack_occupancy_payloads(occ)
    state = state.replace(occ_grid=occ, coarse_payload=cp, fine_payload=fp)

    def trivial_density(x):
        return jnp.sum(x, axis=-1), x

    def trivial_color(dd, geo):
        return jnp.clip(geo, 0, 1)

    @jax.jit
    def render_trivial(ro_, rd_, i):
        out = om.render_rays_grid_turbo(
            trivial_density, trivial_color, ro_, rd_, state, render_cfg,
            rng=jax.random.fold_in(jax.random.PRNGKey(1), i), perturb=True,
            bg_color=jnp.float32(1.0))
        return out["image"]
    timeit("render fwd, trivial net", lambda i: render_trivial(ro[i % POOL], rd[i % POOL], i))

    # encoder-only net
    cfg = CPGridConfig()
    factors = tuple(
        jax.random.normal(jax.random.PRNGKey(b), (3, r, cfg.rank), jnp.float32) * 0.2
        for b, r in enumerate(cfg.resolutions))

    def enc_density(x):
        h = cpgrid_encode((x + 1) / 2, factors, cfg, compute_dtype=jnp.bfloat16)
        return jnp.sum(h.astype(jnp.float32), -1), x

    @jax.jit
    def render_enc(ro_, rd_, i):
        out = om.render_rays_grid_turbo(
            enc_density, trivial_color, ro_, rd_, state, render_cfg,
            rng=jax.random.fold_in(jax.random.PRNGKey(1), i), perturb=True,
            bg_color=jnp.float32(1.0))
        return out["image"]
    timeit("render fwd, encoder-only net", lambda i: render_enc(ro[i % POOL], rd[i % POOL], i))

    # march alone again for cross-check
    @jax.jit
    def march_only(ro_, rd_, i):
        m = om.march_rays_turbo(ro_, rd_, state, render_cfg,
                                rng=jax.random.fold_in(jax.random.PRNGKey(1), i),
                                perturb=True)
        return m["mask"], m["ts"]
    timeit("march only", lambda i: march_only(ro[i % POOL], rd[i % POOL], i))

    # march + compact + rr + place + composite, no net at all
    @jax.jit
    def render_nonet(ro_, rd_, i):
        m = om.march_rays_turbo(ro_, rd_, state, render_cfg,
                                rng=jax.random.fold_in(jax.random.PRNGKey(1), i),
                                perturb=True)
        budget = N * render_cfg.compact_mean_samples
        src, valid, offsets, t_c = om.compact_valid_samples(m["mask"], budget, extra=m["ts"])
        ray_row = jnp.concatenate([ro_, rd_, jnp.zeros((N, 2))], -1)
        rr = jnp.take(ray_row, src // S, axis=0)
        pts = jnp.clip(rr[:, 0:3] + rr[:, 3:6] * t_c[:, None], -1, 1)
        vals = jnp.concatenate([jnp.sum(pts, -1, keepdims=True), pts], -1)
        placed = om.place_compact(vals, offsets, src, S)
        maskb = m["mask"] & ((offsets[:, None] + jnp.arange(S)[None, :]) < budget)
        out = om.composite_rays(placed[..., 0], placed[..., 1:], m["ts"], m["deltas"],
                                maskb, m["nears"], m["fars"])
        return out["image"]
    timeit("march+compact+place+composite (no net)",
           lambda i: render_nonet(ro[i % POOL], rd[i % POOL], i))

    jax.device_get(jnp.zeros(()))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Round-3 forward bisect at the EXACT bench config (turbo-hq,
mean-8 budget, rank-128 x 5-bank cpgrid, real trained-shape grid):
march / compact / encoder / MLPs / full fwd / value_and_grad.
Tunnel-honest: varied inputs per call, n >= 20."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, n=30):
    out = fn(0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(1, n + 1):
        out = fn(i)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:52s} {dt*1e3:9.3f} ms/call", flush=True)
    return dt


def main():
    from ngp_tpu.config import NetworkConfig, RenderConfig
    from ngp_tpu.models import occupancy as om
    from ngp_tpu.models.nerf import NeRFNetwork

    N, S = 16384, 32
    MEAN = 8
    render_cfg = RenderConfig(
        bound=1.0, min_near=0.05, dt_gamma=0.0, max_steps=256,
        max_samples_per_ray=S, grid_size=128, density_thresh=10.0,
        turbo=True, coarse_candidates=96, crossing_slots=16,
        compact_mean_samples=MEAN,
    )
    net_cfg = NetworkConfig(
        encoding="cpgrid", use_bf16=True,
        cp_resolutions=(128, 256, 512, 1024, 2048), cp_rank=128,
        cp_freq_degree=6,
    )
    model = NeRFNetwork(cfg=net_cfg, render=render_cfg)

    rng = np.random.default_rng(0)
    POOL = 8
    ro = np.tile(np.array([[0, 0, -2.0]], np.float32), (POOL, N, 1))
    d = rng.normal(size=(POOL, N, 3)).astype(np.float32)
    d[..., 2] = np.abs(d[..., 2]) + 1.5
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ro = jnp.asarray(ro)
    rd = jnp.asarray(d)

    state = om.init_occupancy(render_cfg)
    occ = jnp.asarray(rng.random((1, 128, 128, 128)) < 0.05)
    cp, fp = om.pack_occupancy_payloads(occ)
    state = state.replace(occ_grid=occ, coarse_payload=cp, fine_payload=fp)

    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((8, 3)), jnp.zeros((8, 3)),
        method=model.full_init,
    )

    # ---- march only
    @jax.jit
    def march(ro_, rd_, i):
        m = om.march_rays_turbo(
            ro_, rd_, state, render_cfg,
            rng=jax.random.fold_in(jax.random.PRNGKey(1), i), perturb=True)
        return m["ts"], m["mask"]
    timeit("march only", lambda i: march(ro[i % POOL], rd[i % POOL], i))

    # ---- march + compact geometry (incl. global sort)
    @jax.jit
    def geo(ro_, rd_, i):
        g = om._turbo_compact_geometry(
            ro_, rd_, state, render_cfg,
            jax.random.fold_in(jax.random.PRNGKey(1), i), True, None, None,
            None)
        return g[7]  # pts
    timeit("march+compact geometry", lambda i: geo(ro[i % POOL], rd[i % POOL], i))

    # ---- network alone on a compact batch [M, 3]
    M = N * MEAN
    pts_pool = jnp.asarray(rng.uniform(-1, 1, (POOL, M, 3)).astype(np.float32))
    dirs_pool = jnp.asarray(d[:, :1].repeat(M, axis=1))

    @jax.jit
    def density_only(p, x):
        sig, geo_ = model.apply(p, x, method=model.density)
        return sig

    timeit("density net (enc+sigma MLP) on compact batch",
           lambda i: density_only(params, pts_pool[i % POOL]))

    @jax.jit
    def full_net(p, x, dd):
        sig, geof = model.apply(p, x, method=model.density)
        rgb = model.apply(p, dd, geof, method=model.color)
        return sig, rgb

    timeit("full net (density+color) on compact batch",
           lambda i: full_net(params, pts_pool[i % POOL], dirs_pool[i % POOL]))

    # ---- full render forward
    def density_fn(p):
        def f(x):
            return model.apply(p, x, method=model.density)
        return f

    def color_fn(p):
        def f(dd, geof):
            return model.apply(p, dd, geof, method=model.color)
        return f

    @jax.jit
    def render_fwd(p, ro_, rd_, i):
        out = om.render_rays_grid_turbo(
            density_fn(p), color_fn(p), ro_, rd_, state, render_cfg,
            rng=jax.random.fold_in(jax.random.PRNGKey(1), i), perturb=True,
            bg_color=jnp.float32(1.0))
        return out["image"]
    timeit("render fwd (full)", lambda i: render_fwd(params, ro[i % POOL], rd[i % POOL], i))

    # ---- value_and_grad of the same
    @jax.jit
    def vg(p, ro_, rd_, i):
        def loss_fn(pp):
            out = om.render_rays_grid_turbo(
                density_fn(pp), color_fn(pp), ro_, rd_, state, render_cfg,
                rng=jax.random.fold_in(jax.random.PRNGKey(1), i),
                perturb=True, bg_color=jnp.float32(1.0))
            return jnp.mean((out["image"] - 0.5) ** 2)
        return jax.value_and_grad(loss_fn)(p)[0]
    timeit("value_and_grad (full)", lambda i: vg(params, ro[i % POOL], rd[i % POOL], i))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Component breakdown of the turbo train step on real TPU."""
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
    from ngp_tpu.config import NetworkConfig, RenderConfig, TrainConfig
    from ngp_tpu.data.nerf_dataset import NeRFDataset
    from ngp_tpu.data.synthetic import make_synthetic_dataset
    from ngp_tpu.models.nerf import NeRFNetwork
    from ngp_tpu.models import occupancy as occ_mod
    from ngp_tpu.training.nerf_grid import GridNeRFTrainer

    cache = os.environ.get("NGP_BENCH_DATA", "/root/.ngp_bench_data")
    make_synthetic_dataset(cache, n_train=16, n_val=1, n_test=1, H=400, W=400)
    train_ds = NeRFDataset(cache, split="train", scale=0.8)

    render_cfg = RenderConfig(
        bound=1.0, min_near=0.05, dt_gamma=0.0, max_steps=256,
        max_samples_per_ray=32, grid_size=128, density_thresh=10.0,
        turbo=True, coarse_candidates=96, crossing_slots=16,
        compact_mean_samples=8,
    )
    net_cfg = NetworkConfig(
        encoding="cpgrid", use_bf16=True,
        cp_resolutions=(256, 512, 1024, 2048), cp_rank=64, cp_freq_degree=5,
    )
    train_cfg = TrainConfig(
        iters=30000, lr=1e-2, num_rays=16384, workspace="/tmp/turbo_ws2",
        update_extra_interval=16,
    )
    model = NeRFNetwork(cfg=net_cfg, render=render_cfg)
    trainer = GridNeRFTrainer(
        model, render_cfg, train_cfg, log_every=10**9, use_tensorboard=False
    )
    trainer.ensure_initialized()
    trainer.mark_untrained(train_ds.poses, train_ds.intrinsics, train_ds.H, train_ds.W)

    # warm to realistic occupancy
    epoch_iter = trainer.make_loader(train_ds)
    n_warm = int(os.environ.get("NGP_WARM_STEPS", "400"))
    done = 0
    while done < n_warm:
        for batch in epoch_iter():
            trainer.on_step_begin()
            trainer.rng, k = jax.random.split(trainer.rng)
            trainer.state, trainer.aux, m = trainer._jit_train_step(
                trainer.state, trainer.aux, batch, k)
            trainer.global_step += 1
            done += 1
            if done >= n_warm:
                break
    jax.block_until_ready(trainer.state.params)
    print("occ frac:", float(jnp.mean(trainer.aux["occ"].occ_grid.astype(jnp.float32))))

    N = train_cfg.num_rays
    S = render_cfg.max_samples_per_ray
    rng = np.random.default_rng(0)
    POOL = 4
    ro = np.tile(np.array([[0, 0, -2.0]], np.float32), (POOL, N, 1))
    d = rng.normal(size=(POOL, N, 3)).astype(np.float32)
    d[..., 2] = np.abs(d[..., 2]) + 1.5
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ro = jnp.asarray(ro); rd = jnp.asarray(d)
    occ = trainer.aux["occ"]
    params = trainer.state.params

    # 1. full train step (rolling)
    batches = [next(iter(epoch_iter()))]
    def full_step(i):
        k = jax.random.fold_in(jax.random.PRNGKey(7), i)
        trainer.state, trainer.aux, m = trainer._jit_train_step(
            trainer.state, trainer.aux, batches[0], k)
        return m["loss"]
    timeit("full train step", full_step)
    params = trainer.state.params
    occ = trainer.aux["occ"]

    # 2. turbo march only
    @jax.jit
    def march_only(ro, rd, occ, i):
        m = occ_mod.march_rays_turbo(
            ro, rd, occ, render_cfg,
            rng=jax.random.fold_in(jax.random.PRNGKey(1), i), perturb=True)
        return m["mask"], jnp.sum(m["n_total"])
    timeit("march_rays_turbo", lambda i: march_only(ro[i % POOL], rd[i % POOL], occ, i))
    _, nval = march_only(ro[0], rd[0], occ, 0)
    print(f"  valid samples {int(nval)} / {N*S} = {int(nval)/(N*S):.3f}")

    # 2b. coarse lookup only at [N, K]
    from ngp_tpu.ops.rays import near_far_from_aabb
    @jax.jit
    def coarse_only(ro, rd, occ, i):
        aabb = jnp.asarray(render_cfg.aabb, jnp.float32)
        nears, fars = near_far_from_aabb(ro, rd, aabb, render_cfg.min_near)
        ts, dts = occ_mod.t_lattice(nears, fars, render_cfg, None)
        x = ro[:, None, :] + rd[:, None, :] * ts[..., None]
        x = jnp.clip(x, -1, 1)
        n = jnp.clip((0.5 * (x + 1.0) * 128).astype(jnp.int32), 0, 127)
        c = n // 4
        flat = (c[..., 0] * 32 + c[..., 1]) * 32 + c[..., 2]
        return occ_mod._coarse_lookup(occ.coarse_payload, flat)
    timeit("coarse lookup [N,256]", lambda i: coarse_only(ro[i % POOL], rd[i % POOL], occ, i))

    # 3. compaction + gathers
    m0 = march_only(ro[0], rd[0], occ, 0)[0]
    @jax.jit
    def compact_only(mask, i):
        src, valid, offsets = occ_mod.compact_valid_samples(mask, N * 16)
        return src, offsets
    timeit("compact_valid_samples", lambda i: compact_only(m0, i))

    # 4. density+color on [M]
    M = N * 16
    pts = jnp.asarray(rng.uniform(-1, 1, size=(POOL, M, 3)).astype(np.float32))
    dirs = jnp.asarray(rng.normal(size=(POOL, M, 3)).astype(np.float32))
    def density_fn(params, x):
        return trainer.model.apply(params, x, method=type(trainer.model).density)
    @jax.jit
    def netfwd(params, x, dd):
        s, geo = density_fn(params, x)
        rgb = trainer.model.apply(params, dd, geo, method=type(trainer.model).color)
        return jnp.sum(s) + jnp.sum(rgb)
    timeit(f"density+color fwd [{M}]", lambda i: netfwd(params, pts[i % POOL], dirs[i % POOL]))
    @jax.jit
    def netbwd(params, x, dd):
        return jax.grad(lambda p: netfwd(p, x, dd))(params)
    timeit(f"density+color fwd+bwd [{M}]", lambda i: netbwd(params, pts[i % POOL], dirs[i % POOL]))

    # 5. render fwd+bwd full
    @jax.jit
    def render_fwdbwd(params, ro, rd, occ, i):
        def loss_fn(p):
            out = trainer.render_batch(
                p, ro, rd, rng=jax.random.fold_in(jax.random.PRNGKey(2), i),
                perturb=True, bg_color=jnp.float32(1.0), aux={"occ": occ})
            return jnp.mean(out["image"] ** 2)
        return jax.grad(loss_fn)(params)
    timeit("render fwd+bwd", lambda i: render_fwdbwd(params, ro[i % POOL], rd[i % POOL], occ, i))

    # 5b. render fwd only
    @jax.jit
    def render_fwd(params, ro, rd, occ, i):
        out = trainer.render_batch(
            params, ro, rd, rng=jax.random.fold_in(jax.random.PRNGKey(2), i),
            perturb=True, bg_color=jnp.float32(1.0), aux={"occ": occ})
        return out["image"]
    timeit("render fwd only", lambda i: render_fwd(params, ro[i % POOL], rd[i % POOL], occ, i))

    # 5c. placement fwd+bwd at production shapes
    from ngp_tpu.models import occupancy as om
    offs = jnp.asarray((rng.integers(0, M, N)).astype(np.int32))
    srcp = jnp.asarray(rng.permutation(N * S)[:M].astype(np.int32))
    vals4 = jnp.asarray(rng.normal(size=(POOL, M, 4)).astype(np.float32))
    @jax.jit
    def place_fb(v):
        def loss(vv):
            return jnp.sum(om.place_compact(vv, offs, srcp, S))
        return jax.grad(loss)(v)
    timeit(f"place_compact fwd+bwd [{M},4]", lambda i: place_fb(vals4[i % POOL]))

    rowtab = jnp.asarray(rng.normal(size=(N, 8)).astype(np.float32))
    rid = jnp.asarray(rng.integers(0, N, (POOL, M)).astype(np.int32))
    @jax.jit
    def rowg(r):
        return jnp.take(rowtab, r, axis=0)
    timeit(f"ray-row gather [{M},8]", lambda i: rowg(rid[i % POOL]))

    # 6. occupancy refresh (partial)
    def upd(params, occst, rng):
        density = lambda x: density_fn(params, x)
        return occ_mod.update_occupancy(
            occst, density, render_cfg, rng,
            density_scale=render_cfg.density_scale)
    jit_upd = jax.jit(upd)
    timeit("update_occupancy (partial)",
           lambda i: jit_upd(params, occ, jax.random.fold_in(jax.random.PRNGKey(3), i)),
           n=10)

    jax.device_get(jnp.zeros(()))


if __name__ == "__main__":
    main()

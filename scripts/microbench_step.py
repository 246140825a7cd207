#!/usr/bin/env python
"""Component breakdown of the bench train step on real TPU.

Times (varying inputs, n>=20, block at end): full step, march only,
encoder fwd, encoder fwd+bwd, MLP fwd+bwd, composite fwd+bwd,
occupancy gather only.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
    print(f"{name:50s} {dt*1e3:9.3f} ms/call")
    return dt


def main():
    from ngp_tpu.config import NetworkConfig, RenderConfig, TrainConfig
    from ngp_tpu.data.nerf_dataset import NeRFDataset
    from ngp_tpu.data.synthetic import make_synthetic_dataset
    from ngp_tpu.models.nerf import NeRFNetwork
    from ngp_tpu.models.occupancy import march_rays, composite_rays, occupancy_at, t_lattice
    from ngp_tpu.training.nerf_grid import GridNeRFTrainer

    cache = os.environ.get("NGP_BENCH_DATA", "/root/.ngp_bench_data")
    make_synthetic_dataset(cache, n_train=16, n_val=1, n_test=1, H=400, W=400)
    train_ds = NeRFDataset(cache, split="train", scale=0.8)

    render_cfg = RenderConfig(
        bound=1.0, min_near=0.05, dt_gamma=0.0, max_steps=256,
        max_samples_per_ray=32, grid_size=128, density_thresh=10.0,
    )
    net_cfg = NetworkConfig(
        encoding="brickgrid", num_levels=8, level_dim=4,
        log2_hashmap_size=15, use_bf16=True,
    )
    train_cfg = TrainConfig(
        iters=30000, lr=1e-2, num_rays=16384, workspace="/tmp/bench_ws",
        update_extra_interval=16,
    )
    model = NeRFNetwork(cfg=net_cfg, render=render_cfg)
    trainer = GridNeRFTrainer(
        model, render_cfg, train_cfg, log_every=10**9, use_tensorboard=False
    )
    trainer.ensure_initialized()
    trainer.mark_untrained(train_ds.poses, train_ds.intrinsics, train_ds.H, train_ds.W)

    N = train_cfg.num_rays
    S = render_cfg.max_samples_per_ray
    rng = np.random.default_rng(0)
    POOL = 4

    # warm up the grid with some real training so occupancy is realistic
    epoch_iter = trainer.make_loader(train_ds)
    n_warm = int(os.environ.get("NGP_WARM_STEPS", "64"))
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
    occ_frac = float(jnp.mean(trainer.aux["occ"].occ_grid.astype(jnp.float32)))
    print(f"after {n_warm} warm steps: occ fraction = {occ_frac:.3f}")

    # ray pools (random rays toward the scene)
    ro = np.tile(np.array([[0, 0, -2.0]], np.float32), (POOL, N, 1))
    d = rng.normal(size=(POOL, N, 3)).astype(np.float32)
    d[..., 2] = np.abs(d[..., 2]) + 1.5
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ro = jnp.asarray(ro); rd = jnp.asarray(d)

    params = trainer.state.params
    occ = trainer.aux["occ"]
    state = trainer.state
    aux = trainer.aux

    # 1. full train step: roll the real state forward (donated buffers)
    batches = []
    for batch in epoch_iter():
        batches.append(batch)
        if len(batches) >= 1:
            break
    def full_step(i):
        k = jax.random.fold_in(jax.random.PRNGKey(7), i)
        trainer.state, trainer.aux, m = trainer._jit_train_step(
            trainer.state, trainer.aux, batches[0], k)
        return m["loss"]
    timeit("full train step", full_step)
    params = trainer.state.params
    occ = trainer.aux["occ"]

    # 2. march only
    @jax.jit
    def march_only(ro, rd, occ, i):
        m = march_rays(ro, rd, occ, render_cfg,
                       rng=jax.random.fold_in(jax.random.PRNGKey(1), i), perturb=True)
        return m["xyzs"], m["mask"], jnp.sum(m["mask"])
    timeit("march_rays (lattice+occ gather+topk)",
           lambda i: march_only(ro[i % POOL], rd[i % POOL], occ, i))

    # valid fraction
    _, msk, nval = march_only(ro[0], rd[0], occ, 0)
    print(f"  valid samples: {int(nval)} / {N*S} = {int(nval)/(N*S):.2f}")

    # 2b. occupancy gather alone at [N, K]
    K = render_cfg.max_steps
    @jax.jit
    def occ_gather(ro, rd, occ, i):
        from ngp_tpu.ops.rays import near_far_from_aabb
        aabb = jnp.asarray(render_cfg.aabb, jnp.float32)
        nears, fars = near_far_from_aabb(ro, rd, aabb, render_cfg.min_near)
        ts, dts = t_lattice(nears, fars, render_cfg, None)
        x = ro[:, None, :] + rd[:, None, :] * ts[..., None]
        x = jnp.clip(x, -render_cfg.bound, render_cfg.bound)
        return occupancy_at(occ, x, dts, render_cfg)
    timeit(f"occ gather [{N}x{K}]",
           lambda i: occ_gather(ro[i % POOL], rd[i % POOL], occ, i))

    # 3. encoder fwd / fwd+bwd on [N*S, 3] points
    pts = jnp.asarray(rng.uniform(-1, 1, size=(POOL, N * S, 3)).astype(np.float32))
    def density_fn(params, x):
        return trainer.model.apply(params, x, method=type(trainer.model).density)

    @jax.jit
    def dens_fwd(params, x):
        s, geo = density_fn(params, x)
        return jnp.sum(s) + jnp.sum(geo)
    timeit(f"density (encode+sigma-MLP) fwd [{N*S}]",
           lambda i: dens_fwd(params, pts[i % POOL]))

    @jax.jit
    def dens_fwdbwd(params, x):
        return jax.grad(lambda p: dens_fwd(p, x))(params)
    timeit(f"density fwd+bwd [{N*S}]",
           lambda i: dens_fwdbwd(params, pts[i % POOL]))

    # encoder alone fwd+bwd
    from ngp_tpu.ops.brickgrid import brick_encode
    bcfg = trainer.model.bound_cfg if hasattr(trainer.model, "bound_cfg") else None
    enc_params = None
    # dig the brick table out of params
    flat = jax.tree_util.tree_leaves_with_path(params)
    for path, leaf in flat:
        pstr = jax.tree_util.keystr(path)
        if "brick" in pstr.lower() or (leaf.ndim == 2 and leaf.shape[-1] == 108):
            print("  brick table:", pstr, leaf.shape, leaf.dtype)

    # 4. full render fwd+bwd (render_batch through value_and_grad)
    @jax.jit
    def render_fwdbwd(params, ro, rd, occ, i):
        def loss_fn(p):
            out = trainer.render_batch(
                p, ro, rd, rng=jax.random.fold_in(jax.random.PRNGKey(2), i),
                perturb=True, bg_color=jnp.float32(1.0), aux={"occ": occ})
            return jnp.mean(out["image"] ** 2)
        return jax.grad(loss_fn)(params)
    timeit("render fwd+bwd (march+net+composite)",
           lambda i: render_fwdbwd(params, ro[i % POOL], rd[i % POOL], occ, i))

    jax.device_get(jnp.zeros(()))


if __name__ == "__main__":
    main()

"""Round-2 perf probe: measure the op-rate landscape on the real TPU.

Honest-timing rules (CLAUDE.md): vary inputs per call (thread a counter
through the jitted fn so XLA can't CSE across calls), n>=20 reps for
slow ops, end with device_get, report ns/row.

Run: python scripts/perf_probe_r2.py [section ...]
Sections: gather scatter sort cumsum step onehot
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def timed(name, fn, args, n=20, unit_rows=None):
    """fn(carry_scalar, *args) -> scalar-ish array.

    The carry (previous call's output) is fed into the next call, so
    successive executions form a true data dependency chain — the
    remote relay cannot overlap or elide them (CLAUDE.md benchmarking
    rules). Linearity across two rep counts is printed as a check.
    """
    f = jax.jit(fn)
    carry = f(jnp.float32(0.0), *args)
    float(jax.device_get(carry))  # block_until_ready lies on this backend
    pers = []
    for reps in (max(n // 2, 2), n):
        t0 = time.perf_counter()
        for _ in range(reps):
            carry = f(carry, *args)
        float(jax.device_get(carry))
        dt = time.perf_counter() - t0
        pers.append(dt / reps)
    per = pers[-1]
    lin = pers[0] / pers[-1]
    extra = f"  {per / unit_rows * 1e9:.2f} ns/row" if unit_rows else ""
    print(f"{name}: {per * 1e3:.3f} ms/call{extra}  (lin {lin:.2f})", flush=True)
    return per


def sec_gather():
    print("== gather (take along axis 0) ==", flush=True)
    key = jax.random.PRNGKey(0)
    for R, W, M, dt in [
        (262144, 108, 4_194_304, jnp.float32),
        (262144, 108, 4_194_304, jnp.bfloat16),
        (262144, 128, 4_194_304, jnp.float32),
        (32768, 108, 524_288, jnp.float32),
        (262144, 8, 4_194_304, jnp.float32),
        (262144, 2, 4_194_304, jnp.float32),
    ]:
        tab = jax.random.normal(key, (R, W), dt)
        idx = jax.random.randint(key, (M,), 0, R)

        def f(c, tab, idx):
            ci = jnp.int32(jnp.mod(c, 1024.0))
            i2 = (idx + ci) % R  # vary indices per call, depend on carry
            return jnp.take(tab, i2, axis=0).sum().astype(jnp.float32)

        timed(f"gather R={R} W={W} M={M} {dt.__name__}", f, (tab, idx), unit_rows=M)


def sec_scatter():
    print("== scatter-add (grad of take) ==", flush=True)
    key = jax.random.PRNGKey(0)
    for R, W, M in [
        (262144, 108, 4_194_304),
        (262144, 108, 2_097_152),
        (32768, 108, 524_288),
        (262144, 1, 4_194_304),
        (262144, 108, 524_288),
    ]:
        tab = jax.random.normal(key, (R, W), jnp.float32)
        idx = jax.random.randint(key, (M,), 0, R)
        g = jax.random.normal(key, (M, W), jnp.float32)

        def f(c, tab, idx, g):
            ci = jnp.int32(jnp.mod(c, 1024.0))
            i2 = (idx + ci) % R

            def loss(t):
                return (jnp.take(t, i2, axis=0) * g).sum()

            return jax.grad(loss)(tab).sum()

        timed(f"scatter R={R} W={W} M={M}", f, (tab, idx, g), n=10, unit_rows=M)
    # direct .at[].add with width 1 (histogram)
    R, M = 262144, 4_194_304
    idx = jax.random.randint(key, (M,), 0, R)

    def hist(c, idx):
        ci = jnp.int32(jnp.mod(c, 1024.0))
        i2 = (idx + ci) % R
        return jnp.zeros((R,), jnp.float32).at[i2].add(1.0 + 0 * c).sum()

    timed(f"histogram .at[].add R={R} M={M}", hist, (idx,), n=10, unit_rows=M)
    # segment_sum on SORTED indices (does XLA exploit sortedness?)
    idxs = jnp.sort(idx)
    g = jax.random.normal(key, (M, 108), jnp.float32)

    def seg(c, idxs, g):
        return jax.ops.segment_sum(g + jnp.mod(c, 7.0), idxs, num_segments=R).sum()

    timed(f"segment_sum sorted R={R} W=108 M={M}", seg, (idxs, g), n=10, unit_rows=M)


def sec_sort():
    print("== sort ==", flush=True)
    key = jax.random.PRNGKey(0)
    for M in [4_194_304, 524_288]:
        k = jax.random.randint(key, (M,), 0, 1 << 18, dtype=jnp.int32)
        v = jnp.arange(M, dtype=jnp.int32)

        def f(c, k, v):
            ci = jnp.int32(jnp.mod(c, 1024.0))
            return jax.lax.sort_key_val(k + ci, v)[1].sum().astype(jnp.float32)

        timed(f"sort_key_val M={M}", f, (k, v), n=10, unit_rows=M)
    # argsort of [N_rays, S] small rows (per-ray sort along axis -1)
    x = jax.random.normal(key, (16384, 256))

    def f2(c, x):
        return jnp.argsort(x + jnp.mod(c, 7.0), axis=-1).sum().astype(jnp.float32)

    timed("argsort [16384, 256] axis=-1", f2, (x,), n=10)


def sec_cumsum():
    print("== cumsum ==", flush=True)
    key = jax.random.PRNGKey(0)
    g = jax.random.normal(key, (4_194_304,), jnp.float32)

    def f(c, g):
        return jnp.cumsum(g + jnp.mod(c, 7.0)).sum()

    timed("cumsum [4.2M] f32", f, (g,), n=10, unit_rows=4_194_304)
    g2 = jax.random.normal(key, (524_288, 128), jnp.float32)

    def f2(c, g2):
        return jnp.cumsum(g2 + jnp.mod(c, 7.0), axis=0).sum()

    timed("cumsum [524288,128] axis0", f2, (g2,), n=10, unit_rows=524_288)


def sec_onehot():
    print("== one-hot matmul (segment-sum via MXU) ==", flush=True)
    key = jax.random.PRNGKey(0)
    # per-block one-hot: [nblk, 256, B] @ [nblk, B, 128] bf16
    nblk, B, L, W = 256, 2048, 256, 128
    oh = jax.random.normal(key, (nblk, L, B), jnp.bfloat16)
    g = jax.random.normal(key, (nblk, B, W), jnp.bfloat16)

    def f(c, oh, g):
        return jnp.einsum(
            "xlb,xbw->xlw", oh, g + jnp.mod(c, 7.0).astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ).sum()

    flops = 2 * nblk * L * B * W
    per = timed(f"bmm [{nblk},{L},{B}]@[{nblk},{B},{W}] bf16", f, (oh, g), n=10)
    print(f"  -> {flops / per / 1e12:.1f} Tflop/s", flush=True)


def sec_step():
    print("== real train step ablations (bench config) ==", flush=True)
    from ngp_tpu.config import NetworkConfig, RenderConfig, TrainConfig
    from ngp_tpu.data.nerf_dataset import NeRFDataset
    from ngp_tpu.data.synthetic import make_synthetic_dataset
    from ngp_tpu.models.nerf import NeRFNetwork
    from ngp_tpu.training.nerf_grid import GridNeRFTrainer

    cache = "/root/.ngp_bench_data"
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
    epoch_iter = trainer.make_loader(train_ds)
    batches = []
    for b in epoch_iter():
        batches.append(b)
        if len(batches) >= 4:
            break

    import flax.traverse_util as tu

    def variants(state, aux, batch, rng, mode):
        """mode: full | frozen_table | fwd_only | march_only"""
        images, poses = batch["images"], batch["poses"]
        idx = batch["idx"]
        F, H, W, C = images.shape
        from ngp_tpu.data.raysampler import rays_from_indices, sample_ray_indices

        k_pix, k_bg, k_render = jax.random.split(rng, 3)
        image, pose = images[idx], poses[idx]
        sample = sample_ray_indices(k_pix, H, W, trainer.train_cfg.num_rays)
        inds = sample["inds"]
        rays = rays_from_indices(pose, batch["intrinsics"], H, W, inds)
        pixels = image.reshape(H * W, C)[inds].astype(jnp.float32)
        bg = jax.random.uniform(k_bg, (trainer.train_cfg.num_rays, 3))
        gt = pixels[..., :3] * pixels[..., 3:] + bg * (1.0 - pixels[..., 3:])

        if mode == "march_only":
            from ngp_tpu.models.occupancy import march_rays

            m = march_rays(
                rays["rays_o"], rays["rays_d"], aux["occ"], trainer.render_cfg,
                rng=k_render, perturb=True,
            )
            return m["xyzs"].sum() + m["mask"].sum()

        def loss_fn(params):
            out = trainer.render_batch(
                params, rays["rays_o"], rays["rays_d"],
                rng=k_render, perturb=True, bg_color=bg, aux=aux,
            )
            return jnp.mean((out["image"] - gt) ** 2)

        if mode == "fwd_only":
            return loss_fn(state.params)
        if mode == "frozen_table":
            flat = tu.flatten_dict(state.params)
            def loss2(mlp_params, tab_params):
                merged = tu.unflatten_dict({**tab_params, **mlp_params})
                return loss_fn(merged)
            mlp = {k: v for k, v in flat.items() if "table" not in str(k) and "embed" not in str(k)}
            tab = {k: v for k, v in flat.items() if k not in mlp}
            print("  frozen-table grads over:", sorted({k[-1] for k in mlp}))
            g = jax.grad(loss2)(mlp, tab)
            return sum(jnp.sum(v) for v in jax.tree.leaves(g))
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return sum(jnp.sum(v) for v in jax.tree.leaves(grads))

    # warm the grid a little so occupancy is realistic
    for i in range(48):
        trainer.on_step_begin()
        trainer.rng, k = jax.random.split(trainer.rng)
        trainer.state, trainer.aux, _ = trainer._jit_train_step(
            trainer.state, trainer.aux, batches[i % 4], k
        )
        trainer.global_step += 1
    jax.block_until_ready(trainer.state.params)

    for mode in ["march_only", "fwd_only", "frozen_table", "full"]:
        f = jax.jit(lambda st, ax, b, r, m=mode: variants(st, ax, b, r, m))
        out = f(trainer.state, trainer.aux, batches[0], jax.random.PRNGKey(0))
        jax.block_until_ready(out)
        n = 30
        t0 = time.perf_counter()
        for i in range(n):
            out = f(trainer.state, trainer.aux, batches[i % 4], jax.random.PRNGKey(i))
        jax.block_until_ready(out)
        per = (time.perf_counter() - t0) / n
        print(f"step[{mode}]: {per * 1e3:.1f} ms", flush=True)

    # full optimizer step (the real thing) for reference
    n = 30
    t0 = time.perf_counter()
    for i in range(n):
        trainer.rng, k = jax.random.split(trainer.rng)
        trainer.state, trainer.aux, m = trainer._jit_train_step(
            trainer.state, trainer.aux, batches[i % 4], k
        )
    jax.block_until_ready(trainer.state.params)
    per = (time.perf_counter() - t0) / n
    print(f"step[jit_train_step incl adam]: {per * 1e3:.1f} ms", flush=True)


SECTIONS = {
    "gather": sec_gather,
    "scatter": sec_scatter,
    "sort": sec_sort,
    "cumsum": sec_cumsum,
    "onehot": sec_onehot,
    "step": sec_step,
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(SECTIONS)
    print("devices:", jax.devices(), flush=True)
    for nm in names:
        SECTIONS[nm]()

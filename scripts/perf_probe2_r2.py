"""Round-2 perf probe, phase 2: scatter-attack candidates.

Measures (real TPU, chained-carry + device_get sync):
- scatter-add variants: bf16, sorted idx, narrow widths
- gather with ray-coherent indices
- Pallas VMEM row-accumulator kernel rate
- Pallas occupancy block-gather estimate (small-table gather widths)
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def timed(name, fn, args, n=10, unit_rows=None):
    f = jax.jit(fn)
    carry = f(jnp.float32(0.0), *args)
    float(jax.device_get(carry.astype(jnp.float32)))
    pers = []
    for reps in (max(n // 2, 2), n):
        t0 = time.perf_counter()
        for _ in range(reps):
            carry = f(carry, *args)
        float(jax.device_get(carry.astype(jnp.float32)))
        dt = time.perf_counter() - t0
        pers.append(dt / reps)
    per = pers[-1]
    lin = pers[0] / pers[-1]
    extra = f"  {per / unit_rows * 1e9:.2f} ns/row" if unit_rows else ""
    print(f"{name}: {per * 1e3:.3f} ms/call{extra}  (lin {lin:.2f})", flush=True)
    return per


def scatter_variants():
    print("== scatter variants ==", flush=True)
    key = jax.random.PRNGKey(0)
    M = 2_097_152
    for R, W, dt, sort in [
        (262144, 108, jnp.float32, False),
        (262144, 108, jnp.float32, True),
        (262144, 108, jnp.bfloat16, False),
        (262144, 108, jnp.bfloat16, True),
        (262144, 54, jnp.float32, False),
        (262144, 27, jnp.float32, False),
        (32768, 108, jnp.float32, True),
    ]:
        tab = jax.random.normal(key, (R, W), dt)
        idx = jax.random.randint(key, (M,), 0, R)
        if sort:
            idx = jnp.sort(idx)
        g = jax.random.normal(key, (M, W), dt)

        def f(c, tab, idx, g):
            ci = jnp.int32(jnp.mod(c, 8.0))
            i2 = jnp.minimum(idx + ci, R - 1)  # preserves sortedness

            def loss(t):
                return (jnp.take(t, i2, axis=0).astype(jnp.float32)
                        * g.astype(jnp.float32)).sum()

            gr = jax.grad(loss)(tab)
            return gr.astype(jnp.float32).sum()

        timed(
            f"scatter R={R} W={W} {dt.__name__} sorted={sort} M={M}",
            f, (tab, idx, g), unit_rows=M,
        )


def gather_coherent():
    print("== gather with coherent indices ==", flush=True)
    key = jax.random.PRNGKey(0)
    R, W, M = 262144, 108, 4_194_304
    for dt in (jnp.float32, jnp.bfloat16):
        tab = jax.random.normal(key, (R, W), dt)
        base = jax.random.randint(key, (M // 16,), 0, R - 16)
        idx = (base[:, None] + jnp.arange(16)[None, :]).reshape(-1)  # runs of 16

        def f(c, tab, idx):
            ci = jnp.int32(jnp.mod(c, 8.0))
            i2 = jnp.minimum(idx + ci, R - 1)
            return jnp.take(tab, i2, axis=0).astype(jnp.float32).sum()

        timed(f"gather coherent16 {dt.__name__} M={M}", f, (tab, idx), unit_rows=M)
    # small-table narrow rows (occupancy block-gather candidate):
    # 32^3-entry table of [4 x uint32] rows (4x4x4 cell bitmask)
    for R2, W2, M2 in [(32768, 4, 1_048_576), (4096, 16, 524_288)]:
        tab = jax.random.randint(key, (R2, W2), 0, 1 << 30, dtype=jnp.int32)
        idx = jax.random.randint(key, (M2,), 0, R2)

        def f2(c, tab, idx):
            ci = jnp.int32(jnp.mod(c, 8.0))
            i2 = jnp.minimum(idx + ci, R2 - 1)
            return jnp.take(tab, i2, axis=0).sum().astype(jnp.float32)

        timed(f"gather occblock R={R2} W={W2}i32 M={M2}", f2, (tab, idx), unit_rows=M2)


def pallas_accumulate():
    print("== pallas VMEM row-accumulator ==", flush=True)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, R, W, B = 2_097_152, 16384, 128, 8192

    def kernel(idx_ref, grad_ref, out_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        def body(i, _):
            r = idx_ref[i]
            out_ref[pl.ds(r, 1), :] += grad_ref[pl.ds(i, 1), :]
            return 0

        jax.lax.fori_loop(0, B, body, 0, unroll=8)

    @jax.jit
    def scatter_pallas(idx, grad):
        return pl.pallas_call(
            kernel,
            grid=(M // B,),
            in_specs=[
                pl.BlockSpec((B,), lambda i: (i,), memory_space=pltpu.SMEM),
                pl.BlockSpec((B, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((R, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, W), jnp.float32),
        )(idx, grad)

    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (M,), 0, R, dtype=jnp.int32)
    grad = jax.random.normal(key, (M, W), jnp.float32)

    # correctness vs XLA scatter on a small slice
    small_idx, small_grad = idx[:4096], grad[:4096]

    @jax.jit
    def ref(idx, grad):
        return jnp.zeros((R, W), jnp.float32).at[idx].add(grad)

    try:
        a = scatter_pallas(small_idx[: M // (M // B)], grad[: B])
    except Exception as e:
        print("pallas accumulate FAILED to build:", repr(e)[:500], flush=True)
        return
    # full-size correctness
    a = jax.device_get(scatter_pallas(idx, grad))
    b = jax.device_get(ref(idx, grad))
    err = np.abs(a - b).max() / (np.abs(b).max() + 1e-9)
    print(f"pallas accumulate correctness rel-err: {err:.2e}", flush=True)

    def f(c, idx, grad):
        ci = jnp.int32(jnp.mod(c, 8.0))
        i2 = jnp.minimum(idx + ci, R - 1)
        return scatter_pallas(i2, grad).sum()

    timed(f"pallas accum R={R} W={W} M={M}", f, (idx, grad), unit_rows=M)


if __name__ == "__main__":
    names = sys.argv[1:] or ["scatter", "gather", "pallas"]
    print("devices:", jax.devices(), flush=True)
    if "scatter" in names:
        scatter_variants()
    if "gather" in names:
        gather_coherent()
    if "pallas" in names:
        pallas_accumulate()

#!/usr/bin/env python
"""Round 2: isolate op cost from data-generation cost.

Inputs still vary per call (cycle a pool of 4 pre-made buffers plus a
per-call scalar perturbation — defeats the relay's identical-call
caching) but generation is NOT inside the timed op.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
    t0 = time.perf_counter()
    for i in range(n + 1, 3 * n + 1):
        out = fn(i)
    jax.block_until_ready(out)
    dt2 = (time.perf_counter() - t0) / (2 * n)
    print(f"{name:55s} {dt*1e3:9.3f} ms/call  (lin x{dt2/dt:.2f})")
    return dt


def main():
    print("devices:", jax.devices())
    R = 32768
    W = 108
    M = 524288
    POOL = 4
    rng = np.random.default_rng(0)
    idx_pool = jnp.asarray(rng.integers(0, R, size=(POOL, M)), jnp.int32)
    g_pool = jnp.asarray(rng.normal(size=(POOL, M, W)).astype(np.float32))
    sidx_pool = jnp.sort(idx_pool, axis=1)
    table = jnp.zeros((R, W), jnp.float32)

    # 0. data-gen cost from round 1 (for the record)
    @jax.jit
    def gen(i):
        k = jax.random.fold_in(jax.random.PRNGKey(0), i)
        idx = jax.random.randint(k, (M,), 0, R)
        g = jax.random.normal(jax.random.fold_in(k, 1), (M, W), jnp.float32)
        return idx, g
    timeit(f"DATA GEN ONLY randint+normal [{M}x{W}]", gen)

    @jax.jit
    def scat(i, idx, g):
        return table.at[idx].add(g + jnp.float32(i) * 1e-12)
    timeit(f"scatter-add random idx     [{M}x{W}] f32",
           lambda i: scat(i, idx_pool[i % POOL], g_pool[i % POOL]))

    @jax.jit
    def scat_sorted(i, idx, g):
        return table.at[idx].add(g + jnp.float32(i) * 1e-12, indices_are_sorted=True)
    timeit(f"scatter-add pre-sorted idx [{M}x{W}] f32",
           lambda i: scat_sorted(i, sidx_pool[i % POOL], g_pool[i % POOL]))

    @jax.jit
    def segsum(i, idx, g):
        return jax.ops.segment_sum(g + jnp.float32(i) * 1e-12, idx,
                                   num_segments=R, indices_are_sorted=True)
    timeit(f"segment_sum pre-sorted ids [{M}x{W}] f32",
           lambda i: segsum(i, sidx_pool[i % POOL], g_pool[i % POOL]))

    # unique scatter: R unique rows
    uidx_pool = jnp.asarray(
        np.stack([rng.permutation(R) for _ in range(POOL)]), jnp.int32)
    gu_pool = g_pool[:, :R]
    @jax.jit
    def scat_unique(i, idx, g):
        return table.at[idx].add(g + jnp.float32(i) * 1e-12, unique_indices=True)
    timeit(f"scatter-add unique idx     [{R}x{W}] f32",
           lambda i: scat_unique(i, uidx_pool[i % POOL], gu_pool[i % POOL]))

    # gather
    bigtab = jnp.asarray(rng.normal(size=(R * 8, W)).astype(np.float32))
    gidx_pool = jnp.asarray(rng.integers(0, R * 8, size=(POOL, M)), jnp.int32)
    @jax.jit
    def gath(i, idx):
        return jnp.take(bigtab, idx, axis=0) + jnp.float32(i) * 1e-12
    timeit(f"gather                     [{M}x{W}] f32",
           lambda i: gath(i, gidx_pool[i % POOL]))

    # gather with 4x fewer, 4x wider rows
    bigtab2 = jnp.asarray(rng.normal(size=(R * 2, W * 4)).astype(np.float32))
    g2idx_pool = jnp.asarray(rng.integers(0, R * 2, size=(POOL, M // 4)), jnp.int32)
    @jax.jit
    def gath_wide(i, idx):
        return jnp.take(bigtab2, idx, axis=0) + jnp.float32(i) * 1e-12
    timeit(f"gather                     [{M//4}x{W*4}] f32",
           lambda i: gath_wide(i, g2idx_pool[i % POOL]))

    # sort kv
    @jax.jit
    def kv_sort(i, idx):
        vals = jnp.arange(M, dtype=jnp.int32)
        sk, sv = jax.lax.sort((idx + i * 0, vals), num_keys=1)
        return sk, sv
    timeit(f"kv sort                    [{M}] i32",
           lambda i: kv_sort(i, idx_pool[i % POOL]))

    # one adjacent-combine pass on pre-sorted data
    @jax.jit
    def pair_combine(i, idx, g):
        g = g + jnp.float32(i) * 1e-12
        e, o = g[0::2], g[1::2]
        ei, oi = idx[0::2], idx[1::2]
        same = ei == oi
        comb = jnp.where(same[:, None], e + o, e)
        return comb, jnp.where(same, ei, oi)
    timeit(f"1 pairwise-combine pass    [{M}x{W}] f32",
           lambda i: pair_combine(i, sidx_pool[i % POOL], g_pool[i % POOL]))

    # dense elementwise baseline: read+write 226MB
    @jax.jit
    def ew(i, g):
        return g * 1.0001 + jnp.float32(i) * 1e-12
    timeit(f"elementwise a*c+b          [{M}x{W}] f32",
           lambda i: ew(i, g_pool[i % POOL]))

    # scatter at 2M rows to confirm linearity in M
    idxL = jnp.asarray(rng.integers(0, R, size=(POOL, 4 * M)), jnp.int32)
    gL = jnp.asarray(rng.normal(size=(POOL, 4 * M, 8)).astype(np.float32))
    tab8 = jnp.zeros((R, 8), jnp.float32)
    @jax.jit
    def scatL(i, idx, g):
        return tab8.at[idx].add(g + jnp.float32(i) * 1e-12)
    timeit(f"scatter-add random idx     [{4*M}x8] f32",
           lambda i: scatL(i, idxL[i % POOL], gL[i % POOL]))

    jax.device_get(table)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Microbenchmarks for embedding-table backward candidates on real TPU.

Honest protocol (CLAUDE.md): inputs vary per call (fresh fold_in key per
iteration, data generated inside the jitted fn), n>=20 per op, linear
scaling spot-check, final device_get.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, n=20, check_linear=True):
    # fn(i) -> jax array(s); compile on i=0
    out = fn(0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(1, n + 1):
        out = fn(i)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    if check_linear:
        t0 = time.perf_counter()
        for i in range(n + 1, 3 * n + 1):
            out = fn(i)
        jax.block_until_ready(out)
        dt2 = (time.perf_counter() - t0) / (2 * n)
        lin = dt2 / dt
    else:
        lin = 1.0
    print(f"{name:55s} {dt*1e3:9.3f} ms/call  (lin check x{lin:.2f})")
    return dt


def main():
    print("devices:", jax.devices())
    R = 32768      # table rows (one hashed level)
    W = 108        # brick row width
    M = 524288     # update rows (16384 rays x 32 samples)
    table = jnp.zeros((R, W), jnp.float32)
    tableb = jnp.zeros((R, W), jnp.bfloat16)

    def data(i, m=M, w=W, dtype=jnp.float32):
        k = jax.random.fold_in(jax.random.PRNGKey(0), i)
        idx = jax.random.randint(k, (m,), 0, R)
        g = jax.random.normal(jax.random.fold_in(k, 1), (m, w), dtype)
        return idx, g

    # 1. baseline scatter-add, random (colliding) indices
    @jax.jit
    def scat(i):
        idx, g = data(i)
        return table.at[idx].add(g)
    timeit(f"scatter-add random idx     [{M}x{W}] f32", scat)

    @jax.jit
    def scat_b(i):
        idx, g = data(i, dtype=jnp.bfloat16)
        return tableb.at[idx].add(g)
    timeit(f"scatter-add random idx     [{M}x{W}] bf16", scat_b)

    # 2. scatter-add, SORTED (still colliding) indices
    @jax.jit
    def scat_sorted(i):
        idx, g = data(i)
        idx = jnp.sort(idx)
        return table.at[idx].add(g, indices_are_sorted=True)
    timeit(f"scatter-add sorted idx     [{M}x{W}] f32", scat_sorted)

    # 3. scatter-add UNIQUE indices (permutation), R rows
    @jax.jit
    def scat_unique(i):
        k = jax.random.fold_in(jax.random.PRNGKey(1), i)
        idx = jax.random.permutation(k, R)
        g = jax.random.normal(jax.random.fold_in(k, 1), (R, W))
        return table.at[idx].add(g, unique_indices=True)
    timeit(f"scatter-add unique idx     [{R}x{W}] f32", scat_unique)

    # 3b. unique AND sorted (= iota): should be a dense add
    @jax.jit
    def scat_unique_sorted(i):
        k = jax.random.fold_in(jax.random.PRNGKey(2), i)
        g = jax.random.normal(k, (R, W))
        idx = jnp.arange(R)
        return table.at[idx].add(g, unique_indices=True, indices_are_sorted=True)
    timeit(f"scatter-add iota idx       [{R}x{W}] f32", scat_unique_sorted)

    # 4. segment_sum with sorted ids
    @jax.jit
    def segsum_sorted(i):
        idx, g = data(i)
        idx = jnp.sort(idx)
        return jax.ops.segment_sum(g, idx, num_segments=R, indices_are_sorted=True)
    timeit(f"segment_sum sorted ids     [{M}x{W}] f32", segsum_sorted)

    # 5. global key-value sort of M int32 pairs
    @jax.jit
    def kv_sort(i):
        k = jax.random.fold_in(jax.random.PRNGKey(3), i)
        keys = jax.random.randint(k, (M,), 0, R)
        vals = jnp.arange(M, dtype=jnp.int32)
        sk, sv = jax.lax.sort((keys, vals), num_keys=1)
        return sk[0] + sv[-1]
    timeit(f"kv sort                    [{M}] i32", kv_sort)

    # 5b. argsort then gather rows in sorted order
    @jax.jit
    def sort_gather(i):
        idx, g = data(i)
        vals = jnp.arange(M, dtype=jnp.int32)
        sk, sv = jax.lax.sort((idx, vals), num_keys=1)
        return jnp.take(g, sv, axis=0), sk
    timeit(f"kv sort + gather rows      [{M}x{W}] f32", sort_gather)

    # 6. cumsum along axis 0 of [M, W]
    @jax.jit
    def big_cumsum(i):
        _, g = data(i)
        return jnp.cumsum(g, axis=0)
    timeit(f"cumsum axis0               [{M}x{W}] f32", big_cumsum)

    # 7. pairwise adjacent-combine pass (one sweep of the reduce tree)
    @jax.jit
    def pair_combine(i):
        idx, g = data(i)
        idx = jnp.sort(idx)
        e, o = g[0::2], g[1::2]
        ei, oi = idx[0::2], idx[1::2]
        same = ei == oi
        comb = jnp.where(same[:, None], e + o, e)
        return comb, jnp.where(same, ei, oi)
    timeit(f"1 pairwise-combine pass    [{M}x{W}] f32", pair_combine)

    # 8. gather baseline
    bigtab = jnp.zeros((R * 8, W), jnp.float32)
    @jax.jit
    def gath(i):
        k = jax.random.fold_in(jax.random.PRNGKey(4), i)
        idx = jax.random.randint(k, (M,), 0, R * 8)
        return jnp.take(bigtab, idx, axis=0)
    timeit(f"gather                     [{M}x{W}] f32", gath)

    # 9. one-hot segment matmul (einsum) for along-ray dedup shape
    N, S, U, C = 16384, 32, 8, W
    @jax.jit
    def ray_dedup_mm(i):
        k = jax.random.fold_in(jax.random.PRNGKey(5), i)
        g = jax.random.normal(k, (N, S, C), jnp.bfloat16)
        slot = jax.random.randint(jax.random.fold_in(k, 1), (N, S), 0, U)
        onehot = jax.nn.one_hot(slot, U, dtype=jnp.bfloat16)
        return jnp.einsum("nsu,nsc->nuc", onehot, g)
    timeit(f"along-ray onehot einsum    [{N}x{S}->{U} x{C}] bf16", ray_dedup_mm)

    # 10. scatter at HALF M (linearity in M)
    M2 = M // 2
    @jax.jit
    def scat_half(i):
        idx, g = data(i, m=M2)
        return table.at[idx].add(g)
    timeit(f"scatter-add random idx     [{M2}x{W}] f32", scat_half)

    # 11. scatter width sensitivity: W=16
    @jax.jit
    def scat_w16(i):
        idx, g = data(i, w=16)
        return jnp.zeros((R, 16), jnp.float32).at[idx].add(g)
    timeit(f"scatter-add random idx     [{M}x16] f32", scat_w16)

    jax.device_get(table)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Verify tile-row gathers: traffic = rows x lane-tiles x 4KB.

All pools generated on-device (HTTP body limit through the relay).
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
    t0 = time.perf_counter()
    for i in range(n + 1, 3 * n + 1):
        out = fn(i)
    jax.block_until_ready(out)
    dt2 = (time.perf_counter() - t0) / (2 * n)
    print(f"{name:58s} {dt*1e3:9.3f} ms/call (lin x{dt2/dt:.2f})")
    return dt


def pool_int(key, pool, shape, lo, hi):
    return jax.device_put(jax.random.randint(key, (pool, *shape), lo, hi, jnp.int32))


def main():
    POOL = 4
    kk = jax.random.PRNGKey(0)
    ks = jax.random.split(kk, 16)

    M = 262144  # compacted points budget (N x 16)
    R = 16384

    # 1. bf16 tile-row gather: [R, 16, 128] bf16, one row = one 4KB tile
    tab_bf = jax.random.normal(ks[0], (R, 16, 128), jnp.bfloat16)
    rows = 2 * M
    idx = pool_int(ks[1], POOL, (rows,), 0, R)
    @jax.jit
    def g_bf(i, ix):
        return jnp.take(tab_bf, ix, axis=0)
    d = timeit(f"gather bf16 [R,16,128] rows={rows}",
               lambda i: g_bf(i, idx[i % POOL]))
    print(f"   -> {rows*4096/d/1e9:.0f} GB/s effective (4KB/row)")

    # 2. f32 tile-row gather [R, 8, 128]
    tab_f = jax.random.normal(ks[2], (R, 8, 128), jnp.float32)
    @jax.jit
    def g_f(i, ix):
        return jnp.take(tab_f, ix, axis=0)
    d = timeit(f"gather f32 [R,8,128] rows={rows}",
               lambda i: g_f(i, idx[i % POOL]))
    print(f"   -> {rows*4096/d/1e9:.0f} GB/s effective")

    # 3. bf16 tile-row scatter-add
    zero_bf = jnp.zeros((R, 16, 128), jnp.bfloat16)
    gbuf = jax.random.normal(ks[3], (POOL, rows, 16, 128), jnp.bfloat16)
    @jax.jit
    def s_bf(ix, g):
        return zero_bf.at[ix].add(g)
    d = timeit(f"scatter-add bf16 [R,16,128] rows={rows}",
               lambda i: s_bf(idx[i % POOL], gbuf[i % POOL]))
    print(f"   -> {rows*2*4096/d/1e9:.0f} GB/s rmw effective")

    # 4. f32 tile-row scatter-add
    zero_f = jnp.zeros((R, 8, 128), jnp.float32)
    gbuf_f = jax.random.normal(ks[4], (POOL, rows, 8, 128), jnp.float32)
    @jax.jit
    def s_f(ix, g):
        return zero_f.at[ix].add(g)
    d = timeit(f"scatter-add f32 [R,8,128] rows={rows}",
               lambda i: s_f(idx[i % POOL], gbuf_f[i % POOL]))
    print(f"   -> {rows*2*4096/d/1e9:.0f} GB/s rmw effective")

    # 5. window-gather placement: [N] rows of 128 lanes from flat [M*4]
    N, S = 16384, 32
    compact_flat = jax.random.normal(ks[5], (POOL, (M + 64) * 4), jnp.float32)
    offs = pool_int(ks[6], POOL, (N,), 0, M * 4 // 2)
    @jax.jit
    def window(i, flat, o):
        idx2 = o[:, None] + jnp.arange(S * 4)[None, :]
        return jnp.take(flat, idx2)  # [N, 128]
    timeit(f"window placement gather    [{N}x{S*4}]",
           lambda i: window(i, compact_flat[i % POOL], offs[i % POOL]))

    # 6. bwd placement gather: [M] 4-lane rows from [N*S, 4]
    pg = jax.random.normal(ks[7], (POOL, N * S, 4), jnp.float32)
    src = pool_int(ks[8], POOL, (M,), 0, N * S)
    @jax.jit
    def bwd_place(i, g, s):
        return jnp.take(g, s, axis=0)
    timeit(f"bwd placement gather       [{M}x4] from [{N*S}]",
           lambda i: bwd_place(i, pg[i % POOL], src[i % POOL]))

    # 7. slot dedup on [N, Kc] -> U slots + payload row gather
    Kc, U = 96, 24
    cells = jnp.sort(pool_int(ks[9], POOL, (N, Kc), 0, 32768), axis=-1)
    paytab = jax.random.normal(ks[10], (32768, 128), jnp.float32)
    @jax.jit
    def slots(c):
        new = jnp.concatenate(
            [jnp.ones((N, 1), bool), c[:, 1:] != c[:, :-1]], axis=1)
        slot = jnp.cumsum(new.astype(jnp.int32), axis=1) - 1
        slot_c = jnp.minimum(slot, U - 1)
        onehot = (slot_c[:, :, None] == jnp.arange(U)[None, None, :]) & new[:, :, None]
        slot_cell = jnp.max(jnp.where(onehot, c[:, :, None], -1), axis=1)
        pay = jnp.take(paytab, jnp.maximum(slot_cell, 0).reshape(-1), axis=0)
        return pay.reshape(N, U, 128), slot_c
    timeit(f"slot dedup + payload gather [{N}x{Kc}] -> {U}",
           lambda i: slots(cells[i % POOL]))

    # 8. extraction einsum: one-hot select 2-of-9 per axis on [M, 9,9,9, C]
    C = 2
    halos = jax.random.normal(ks[11], (POOL, M, 9, 9, 9, C), jnp.bfloat16)
    offsb = pool_int(ks[12], POOL, (M, 3), 0, 8)
    @jax.jit
    def extract(h, o):
        # per-axis one-hot window select: out[m, a] = h[m, o+a] for a in {0,1}
        oh = jax.nn.one_hot(o, 9, dtype=jnp.bfloat16)  # [M, 3, 9]
        oh_pair = jnp.stack([oh, jnp.roll(oh, 1, axis=-1)], axis=2)  # [M,3,2,9]
        hx = jnp.einsum("mai,miyzc->mayzc", oh_pair[:, 0], h)
        hy = jnp.einsum("mbi,mayic...,", oh_pair[:, 1], hx) if False else \
             jnp.einsum("mbi,mayzc->mabzc", oh_pair[:, 1], hx.transpose(0, 1, 2, 3, 4))
        return hx
    # simpler: just time the first einsum (the big one)
    @jax.jit
    def extract1(h, o):
        oh = jax.nn.one_hot(o[:, 0], 9, dtype=jnp.bfloat16)
        oh2 = jnp.stack([oh, jnp.roll(oh, 1, axis=-1)], axis=1)  # [M, 2, 9]
        return jnp.einsum("mai,miyzc->mayzc", oh2, h)  # [M,2,9,9,C]
    timeit(f"extract einsum x-axis      [{M},9^3,{C}] bf16",
           lambda i: extract1(halos[i % POOL], offsb[i % POOL]))

    # 9. shift-select variant for comparison
    @jax.jit
    def extract_shift(h, o):
        ox = o[:, 0]
        v = h
        # shift by 4 if bit2: take window [4:9] else [0:5]
        m2 = (ox >= 4)[:, None, None, None, None]
        v = jnp.where(m2, v[:, 4:9], v[:, 0:5])
        o2 = jnp.where(ox >= 4, ox - 4, ox)
        m1 = (o2 >= 2)[:, None, None, None, None]
        v = jnp.where(m1, v[:, 2:5], v[:, 0:3])
        o1 = jnp.where(o2 >= 2, o2 - 2, o2)
        m0 = (o1 >= 1)[:, None, None, None, None]
        v = jnp.where(m0, v[:, 1:3], v[:, 0:2])
        return v  # [M, 2, 9, 9, C]
    timeit(f"extract shift-select x-axis [{M},9^3,{C}] bf16",
           lambda i: extract_shift(halos[i % POOL], offsb[i % POOL]))

    jax.device_get(jnp.zeros(()))


if __name__ == "__main__":
    main()

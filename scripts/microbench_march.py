#!/usr/bin/env python
"""Dissect march_rays_turbo internals on real TPU."""
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
    N, K, K2, S, U = 16384, 256, 96, 32, 16
    rng = np.random.default_rng(0)
    POOL = 4

    valid = jnp.asarray(rng.random((POOL, N, K)) < 0.3)
    ts = jnp.asarray(np.cumsum(rng.random((POOL, N, K)).astype(np.float32), axis=-1))

    # 1. top_k K->K2
    @jax.jit
    def topk1(v):
        ks = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None, :], (N, K))
        key = jnp.where(v, ks, ks + K)
        _, pos = jax.lax.top_k(-key, K2)
        return pos
    timeit(f"top_k [N,{K}] -> {K2}", lambda i: topk1(valid[i % POOL]))

    # 2. top_k K2->S
    validS = jnp.asarray(rng.random((POOL, N, K2)) < 0.3)
    @jax.jit
    def topk2(v):
        ks = jnp.broadcast_to(jnp.arange(K2, dtype=jnp.int32)[None, :], (N, K2))
        key = jnp.where(v, ks, ks + K2)
        _, pos = jax.lax.top_k(-key, S)
        return pos
    timeit(f"top_k [N,{K2}] -> {S}", lambda i: topk2(validS[i % POOL]))

    # 2b. variant: per-row kv sort instead of top_k
    @jax.jit
    def rowsort(v):
        ks = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None, :], (N, K))
        key = jnp.where(v, ks, ks + K)
        iota = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None, :], (N, K))
        sk, sv = jax.lax.sort((key, iota), dimension=1, num_keys=1)
        return sv[:, :K2]
    timeit(f"row kv-sort [N,{K}] -> {K2}", lambda i: rowsort(valid[i % POOL]))

    # 3. cells_at cost on [N, K]
    ro = np.tile(np.array([[0, 0, -2.0]], np.float32), (POOL, N, 1))
    d = rng.normal(size=(POOL, N, 3)).astype(np.float32)
    d[..., 2] = np.abs(d[..., 2]) + 1.5
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ro = jnp.asarray(ro); rd = jnp.asarray(d)
    tsK = jnp.asarray(rng.random((POOL, N, K)).astype(np.float32) * 2 + 0.1)
    @jax.jit
    def cells(ro_, rd_, ts_):
        x = ro_[:, None, :] + rd_[:, None, :] * ts_[..., None]
        x = jnp.clip(x, -1, 1)
        n = jnp.clip((0.5 * (x + 1.0) * 128).astype(jnp.int32), 0, 127)
        c = n // 4
        return (c[..., 0] * 32 + c[..., 1]) * 32 + c[..., 2]
    timeit(f"cells_at (no mip) [N,{K}]",
           lambda i: cells(ro[i % POOL], rd[i % POOL], tsK[i % POOL]))

    # 3b. with mip (log2 transcendentals)
    @jax.jit
    def cells_mip(ro_, rd_, ts_):
        x = ro_[:, None, :] + rd_[:, None, :] * ts_[..., None]
        x = jnp.clip(x, -1, 1)
        mx = jnp.max(jnp.abs(x), axis=-1)
        lev = jnp.clip((jnp.floor(jnp.log2(jnp.maximum(mx, 1e-30))) + 1).astype(jnp.int32), 0, 0)
        mb = jnp.minimum(2.0 ** lev.astype(jnp.float32), 1.0)
        n = jnp.clip((0.5 * (x / mb[..., None] + 1.0) * 128).astype(jnp.int32), 0, 127)
        c = n // 4
        return (lev * 32 + c[..., 0]) * 32 * 32 + c[..., 1] * 32 + c[..., 2]
    timeit(f"cells_at (with mip) [N,{K}]",
           lambda i: cells_mip(ro[i % POOL], rd[i % POOL], tsK[i % POOL]))

    # 4. crossing machinery on [N, K2]
    flat2 = jnp.asarray(np.sort(rng.integers(0, 32768, (POOL, N, K2)), axis=-1).astype(np.int32))
    paytab = jnp.asarray(rng.integers(0, 2**31, size=(32768, 2)).astype(np.uint32))
    @jax.jit
    def crossings(f2):
        cmask = jnp.ones((N, K2), bool)
        change = jnp.concatenate(
            [jnp.ones((N, 1), bool), f2[:, 1:] != f2[:, :-1]], axis=1) & cmask
        slot = jnp.cumsum(change.astype(jnp.int32), axis=1) - 1
        slot_cl = jnp.clip(slot, 0, U - 1)
        oh = (slot[:, :, None] == jnp.arange(U)[None, None, :]) & change[:, :, None]
        slot_cell = jnp.max(jnp.where(oh, f2[:, :, None], -1), axis=1)
        pay = jnp.take(paytab, jnp.maximum(slot_cell, 0).reshape(-1), axis=0).reshape(N, U, 2)
        w0 = jnp.take_along_axis(pay[..., 0], slot_cl, axis=1)
        w1 = jnp.take_along_axis(pay[..., 1], slot_cl, axis=1)
        return w0, w1
    timeit(f"crossing slots+payload [N,{K2}] U={U}",
           lambda i: crossings(flat2[i % POOL]))

    # 5. row gathers [M, 3]
    M = N * 16
    xyz = jnp.asarray(rng.normal(size=(POOL, N * S, 3)).astype(np.float32))
    src = jnp.asarray(rng.integers(0, N * S, (POOL, M)).astype(np.int32))
    @jax.jit
    def gath3(x, s):
        return jnp.take(x, s, axis=0)
    timeit(f"gather [M={M}, 3] rows", lambda i: gath3(xyz[i % POOL], src[i % POOL]))

    # 6. take_along_axis [N,K2] from [N,K]
    posP = jnp.asarray(rng.integers(0, K, (POOL, N, K2)).astype(np.int32))
    @jax.jit
    def tal(t, p):
        return jnp.take_along_axis(t, p, axis=1)
    timeit(f"take_along_axis [N,{K}]->[N,{K2}]",
           lambda i: tal(tsK[i % POOL], posP[i % POOL]))

    jax.device_get(jnp.zeros(()))


if __name__ == "__main__":
    main()

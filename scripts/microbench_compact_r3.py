#!/usr/bin/env python
"""Compare valid-sample compaction strategies at the bench shape
(N=16384 rays, S=32 slots, budget=N*8):

  a) global kv sort (current compact_valid_samples)
  b) segmented sort: [G, (N/G)*S] batched lax.sort, per-group budget
  c) scatter-max + cummax src construction (no sort)

All produce (src, valid, offsets[, t_c]); timed with varied masks.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, n=40):
    out = fn(0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(1, n + 1):
        out = fn(i)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:52s} {dt*1e3:9.3f} ms/call", flush=True)
    return dt


def make_masks(rng, pool, N, S, mean):
    # prefix-valid masks with mean ~`mean` samples/ray, 4-aligned
    counts = np.minimum(
        rng.poisson(mean, size=(pool, N)).astype(np.int32), S
    )
    counts = (counts + 3) // 4 * 4
    m = np.arange(S)[None, None, :] < counts[..., None]
    return jnp.asarray(m)


def main():
    N, S, MEAN = 16384, 32, 8
    budget = N * MEAN
    POOL = 8
    rng = np.random.default_rng(0)
    masks = make_masks(rng, POOL, N, S, MEAN)
    ts = jnp.asarray(rng.random((POOL, N, S)).astype(np.float32))

    from ngp_tpu.models.occupancy import compact_valid_samples

    @jax.jit
    def global_sort(mask, t):
        return compact_valid_samples(mask, budget, extra=t)

    timeit("a) global sort (current)",
           lambda i: global_sort(masks[i % POOL], ts[i % POOL]))

    def segmented(mask, t, G):
        Ng = N // G
        Bg = budget // G
        flat = mask.reshape(G, Ng * S)
        iota = jnp.arange(Ng * S, dtype=jnp.int32)[None, :]
        keys = jnp.where(flat, iota, Ng * S + iota)
        keys = jnp.broadcast_to(keys, (G, Ng * S))
        sk, si, st = jax.lax.sort(
            (keys, jnp.broadcast_to(iota, (G, Ng * S)),
             t.reshape(G, Ng * S)),
            dimension=1, num_keys=1)
        src = (si[:, :Bg] + (jnp.arange(G, dtype=jnp.int32) * (Ng * S))[:, None]).reshape(-1)
        valid = (sk[:, :Bg] < Ng * S).reshape(-1)
        t_c = st[:, :Bg].reshape(-1)
        counts = jnp.sum(mask, axis=1)
        cg = counts.reshape(G, Ng)
        off_local = jnp.cumsum(cg, axis=1) - cg
        offsets = (off_local + (jnp.arange(G) * Bg)[:, None]).reshape(-1).astype(jnp.int32)
        return src, valid, offsets, t_c

    for G in (4, 8, 16, 32):
        f = jax.jit(lambda mask, t, G=G: segmented(mask, t, G))
        timeit(f"b) segmented sort G={G}",
               lambda i, f=f: f(masks[i % POOL], ts[i % POOL]))

    ALIGN = 4

    @jax.jit
    def scatter_cummax(mask, t):
        counts = jnp.sum(mask, axis=1)
        offsets = (jnp.cumsum(counts) - counts).astype(jnp.int32)
        nblocks = budget // ALIGN
        start_blk = offsets // ALIGN
        ray_ids = jnp.arange(N, dtype=jnp.int32)
        # rays with zero samples cede their start to the next ray
        # (scatter-max with duplicate indices keeps the max = later ray
        # only if it has samples; zero-count rays must not win)
        owner = jnp.full((nblocks,), -1, jnp.int32)
        upd = jnp.where(counts > 0, ray_ids, -1)
        owner = owner.at[jnp.minimum(start_blk, nblocks - 1)].max(upd)
        owner = jax.lax.associative_scan(jnp.maximum, owner)
        ray_b = jnp.maximum(owner, 0)  # [nblocks]
        j_b = jnp.arange(nblocks, dtype=jnp.int32) - start_blk[ray_b]
        src_b = ray_b * S + j_b * ALIGN
        src = (src_b[:, None] + jnp.arange(ALIGN, dtype=jnp.int32)[None, :]).reshape(-1)
        # valid: block within its ray's (4-aligned) count
        cnt8 = (counts + ALIGN - 1) // ALIGN * ALIGN
        valid = ((j_b * ALIGN)[:, None] + jnp.arange(ALIGN)[None, :]
                 < cnt8[ray_b][:, None]).reshape(-1)
        valid &= jnp.repeat(owner >= 0, ALIGN)
        valid &= jnp.repeat(j_b >= 0, ALIGN)
        # t payload: row gather of [NS/ALIGN, ALIGN] blocks
        t8 = t.reshape(N * S // ALIGN, ALIGN)
        t_c = jnp.take(t8, jnp.clip(src_b // ALIGN, 0, N * S // ALIGN - 1),
                       axis=0).reshape(-1)
        return src, valid, offsets, t_c

    timeit("c) scatter-max + cummax",
           lambda i: scatter_cummax(masks[i % POOL], ts[i % POOL]))

    # parity check (a vs b vs c) on one mask
    sa = global_sort(masks[0], ts[0])
    for G in (8,):
        sb = jax.jit(lambda mask, t: segmented(mask, t, G))(masks[0], ts[0])
    sc = scatter_cummax(masks[0], ts[0])
    # compare per-ray offsets modulo grouping: only check (a) internal
    # consistency of each: valid t payload equals t at src
    for nm, (src, valid, off, tc) in (("a", sa), ("b", sb), ("c", sc)):
        src = np.asarray(src); valid = np.asarray(valid); tc = np.asarray(tc)
        tf = np.asarray(ts[0]).reshape(-1)
        ok = np.allclose(tc[valid], tf[src[valid]])
        print(f"{nm}: t-payload consistent: {ok}, n_valid={valid.sum()}")


if __name__ == "__main__":
    main()

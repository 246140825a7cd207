#!/usr/bin/env python
"""Measure the v2 march/encoder building blocks on real TPU.

1. coarse occupancy test variants at P = N*K = 4.2M points:
   B. one-hot einsum against bit-packed payload + lane-select
   C. direct u32 word gather from a 1024-entry table + bit extract
   A. direct bool gather (control, expect ~31ms)
2. compaction machinery: kv-sort over N*S + cumsum inverse + gathers
3. wide-row bf16 gather + f32/bf16 scatter at tile-sized rows
4. per-ray slot dedup (crossing compaction) on [N, Kc]
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


def main():
    N, K, S = 16384, 256, 32
    P = N * K
    rng = np.random.default_rng(0)
    POOL = 4

    # coarse grid: 32^3 bits
    occ = rng.random((32, 32, 32)) < 0.3
    flat = occ.reshape(-1)  # 32768 bits
    # 8-bit packed payload [32, 128]: payload[i, j] = byte (i*128+j)
    bytes_ = np.packbits(flat.reshape(-1, 8), axis=-1, bitorder="little").reshape(4096)
    payload_bf16 = jnp.asarray(bytes_.reshape(32, 128).astype(np.float32), jnp.bfloat16)
    # u32-packed words [1024]
    words = np.zeros(1024, np.uint32)
    for b in range(32):
        words |= (flat.reshape(1024, 32)[:, b].astype(np.uint32) << b)
    words_tab = jnp.asarray(words.reshape(8, 128))
    bool_tab = jnp.asarray(flat)

    cell_pool = jnp.asarray(rng.integers(0, 32768, size=(POOL, P)), jnp.int32)

    # B: one-hot einsum (8-bit packed) + lane select via second one-hot
    @jax.jit
    def coarse_B(cell):
        byte_idx = cell >> 3          # [P] in [0, 4096)
        bit = cell & 7
        hi = byte_idx >> 7            # [0, 32)
        lo = byte_idx & 127           # [0, 128)
        oh_hi = jax.nn.one_hot(hi, 32, dtype=jnp.bfloat16)      # [P, 32]
        vals = jnp.einsum("ph,hl->pl", oh_hi, payload_bf16)      # [P, 128]
        oh_lo = jax.nn.one_hot(lo, 128, dtype=jnp.bfloat16)
        byte_val = jnp.sum(vals * oh_lo, axis=-1).astype(jnp.int32)  # [P]
        return (byte_val >> bit) & 1
    timeit(f"coarse B onehot-einsum     [{P}]",
           lambda i: coarse_B(cell_pool[i % POOL]))

    # C: u32 word gather from [8,128] table
    @jax.jit
    def coarse_C(cell):
        w = cell >> 5                 # [0, 1024)
        b = cell & 31
        vals = jnp.take(words_tab.reshape(-1), w)   # [P] u32 gather from 1024
        return (vals >> b.astype(jnp.uint32)) & 1
    timeit(f"coarse C u32-word gather   [{P}] (1024-entry tab)",
           lambda i: coarse_C(cell_pool[i % POOL]))

    # A: bool gather control
    @jax.jit
    def coarse_A(cell):
        return jnp.take(bool_tab, cell)
    timeit(f"coarse A bool gather       [{P}] (32768-entry tab)",
           lambda i: coarse_A(cell_pool[i % POOL]))

    # --- compaction machinery at N*S ---------------------------------------
    NS = N * S
    Mpts = N * 16
    mask_pool = jnp.asarray(rng.random((POOL, NS)) < 0.35)
    xyz_pool = jnp.asarray(rng.normal(size=(POOL, NS, 3)).astype(np.float32))

    @jax.jit
    def compact(mask, xyz):
        flatpos = jnp.arange(NS, dtype=jnp.int32)
        keys = jnp.where(mask, flatpos, NS + flatpos)
        src = jax.lax.sort((keys, flatpos), num_keys=1)[1][:Mpts]   # [Mpts]
        inv = jnp.cumsum(mask.astype(jnp.int32)) - 1                 # [NS]
        inv = jnp.where(mask & (inv < Mpts), inv, Mpts)              # dump slot
        pts = jnp.take(xyz, src, axis=0)                             # [Mpts, 3]
        return pts, src, inv
    timeit(f"compaction sort+cumsum+gather [{NS}] -> {Mpts}",
           lambda i: compact(mask_pool[i % POOL], xyz_pool[i % POOL]))

    # placement gather back: [NS, F] from [Mpts+1, F]
    F = 64
    feat_pool = jnp.asarray(rng.normal(size=(POOL, Mpts + 1, F)).astype(np.float32))
    inv0 = compact(mask_pool[0], xyz_pool[0])[2]
    @jax.jit
    def place(feat, inv):
        return jnp.take(feat, inv, axis=0)   # [NS, F]
    timeit(f"placement gather           [{NS}x{F}] from [{Mpts}]",
           lambda i: place(feat_pool[i % POOL], inv0))

    # --- wide-row bf16 gather / scatter at tile-sized rows ------------------
    R = 98304  # ~3 level-triplets x 32768
    Wb = 1870
    tab_bf = jnp.asarray(rng.normal(size=(R, 2048)).astype(np.float32), jnp.bfloat16)
    rows = 3 * Mpts
    ridx_pool = jnp.asarray(rng.integers(0, R, size=(POOL, rows)), jnp.int32)
    @jax.jit
    def wide_gather(idx):
        return jnp.take(tab_bf, idx, axis=0)
    timeit(f"bf16 gather 2048-wide      [{rows}]",
           lambda i: wide_gather(ridx_pool[i % POOL]))

    g_pool = jnp.asarray(rng.normal(size=(POOL, rows, 2048)).astype(np.float32), jnp.bfloat16)
    zero_bf = jnp.zeros((R, 2048), jnp.bfloat16)
    @jax.jit
    def wide_scatter(idx, g):
        return zero_bf.at[idx].add(g)
    timeit(f"bf16 scatter 2048-wide     [{rows}]",
           lambda i: wide_scatter(ridx_pool[i % POOL], g_pool[i % POOL]))

    # f32 1024-wide for comparison (pair design)
    tab_f32 = jnp.asarray(rng.normal(size=(R, 1024)).astype(np.float32))
    rows4 = 4 * Mpts
    ridx4_pool = jnp.asarray(rng.integers(0, R, size=(POOL, rows4)), jnp.int32)
    @jax.jit
    def wide_gather_f32(idx):
        return jnp.take(tab_f32, idx, axis=0)
    timeit(f"f32 gather 1024-wide       [{rows4}]",
           lambda i: wide_gather_f32(ridx4_pool[i % POOL]))

    # --- per-ray slot dedup on [N, Kc] --------------------------------------
    Kc, U = 96, 24
    cells_pool = jnp.asarray(
        np.sort(rng.integers(0, 32768, size=(POOL, N, Kc)), axis=-1), jnp.int32)
    paytab = jnp.asarray(rng.integers(0, 2**31, size=(32768, 2)), jnp.uint32)
    @jax.jit
    def slots(cells):
        new = jnp.concatenate(
            [jnp.ones((N, 1), bool), cells[:, 1:] != cells[:, :-1]], axis=1)
        slot = jnp.cumsum(new.astype(jnp.int32), axis=1) - 1        # [N, Kc]
        slot_c = jnp.minimum(slot, U - 1)
        # first cell id per slot: scatter-free via max trick
        onehot = (slot_c[:, :, None] == jnp.arange(U)[None, None, :]) & new[:, :, None]
        slot_cell = jnp.max(
            jnp.where(onehot, cells[:, :, None], -1), axis=1)       # [N, U]
        pay = jnp.take(paytab, jnp.maximum(slot_cell, 0).reshape(-1), axis=0)
        return pay.reshape(N, U, 2), slot_c
    timeit(f"slot dedup+payload gather  [{N}x{Kc}] -> {U} slots",
           lambda i: slots(cells_pool[i % POOL]))

    # --- cumsum 1-D N*S i32 --------------------------------------------------
    @jax.jit
    def cs(i, m):
        return jnp.cumsum(m.astype(jnp.int32))
    timeit(f"cumsum 1-D                 [{NS}] i32",
           lambda i: cs(i, mask_pool[i % POOL]))

    jax.device_get(jnp.zeros(()))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""CP kernel timing at production shapes on real TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ngp_tpu.ops.pallas.cp_kernels import cp_encode


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
    RES = (256, 512, 1024, 2048)
    RANK = 64
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    factors = tuple(
        jax.random.normal(ks[b], (3, r, RANK), jnp.bfloat16) * 0.3
        for b, r in enumerate(RES)
    )
    POOL = 4
    for M in (262144, 524288):
        pos = jax.random.uniform(ks[5], (POOL, M, 3), jnp.float32)

        @jax.jit
        def fwd(p):
            return cp_encode(p, factors, RES, 1024)
        timeit(f"cp_encode fwd   M={M} banks={RES} R={RANK}",
               lambda i: fwd(pos[i % POOL]))

        g = jax.random.normal(ks[6], (POOL, M, len(RES) * RANK), jnp.float32)

        @jax.jit
        def fwdbwd(p, gg):
            def loss(fs):
                return jnp.sum(cp_encode(p, fs, RES, 1024) * gg)
            return jax.grad(loss)(factors)
        timeit(f"cp_encode fwd+bwd M={M}",
               lambda i: fwdbwd(pos[i % POOL], g[i % POOL]))
    jax.device_get(jnp.zeros(()))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""CP-encode roofline check on the real TPU at turbo-hq train shapes:
M=131072 samples, banks (128,256,512,1024,2048) x rank 128 bf16.

fwd ideal (MXU): 2*M*sum(res)*R*3 = 400 GFLOP -> ~2.0 ms at v5e peak
(197 TFLOP/s bf16). Reports achieved ms + implied MFU for fwd and
fwd+bwd.

Relay-honest: positions vary per call, n>=30, block_until_ready.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from ngp_tpu.ops.pallas.cp_kernels import cp_encode


def timeit(name, fn, n=30):
    out = fn(0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(1, n + 1):
        out = fn(i)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:40s} {dt*1e3:9.2f} ms/call", flush=True)
    return dt


def main():
    RES = (128, 256, 512, 1024, 2048)
    R = 128
    M = 131072
    rng = np.random.default_rng(0)
    factors = tuple(
        jnp.asarray(rng.normal(0, 0.1, (3, r, R)).astype(np.float32)).astype(jnp.bfloat16)
        for r in RES
    )
    POOL = 8
    pos_pool = jnp.asarray(rng.uniform(0, 1, (POOL, M, 3)).astype(np.float32))
    g = jnp.asarray(rng.normal(0, 1, (M, len(RES) * R)).astype(np.float32))

    fwd = jax.jit(lambda p: cp_encode(p, factors, RES))

    def loss(p, f, gg):
        # gg passed as an argument: a closure constant would be baked
        # into the compile payload (335 MB -> HTTP 413 on the relay)
        return jnp.vdot(cp_encode(p, f, RES), gg)

    bwd = jax.jit(jax.grad(loss, argnums=1))

    flop_fwd = 2 * M * sum(RES) * R * 3
    t = timeit("cp_encode fwd", lambda i: fwd(pos_pool[i % POOL]))
    print(f"  fwd MFU: {flop_fwd / t / 197e12 * 100:.1f}% "
          f"({flop_fwd/1e9:.0f} GFLOP)")
    t2 = timeit("cp_encode fwd+bwd (grad wrt factors)",
                lambda i: bwd(pos_pool[i % POOL], factors, g))
    # bwd = vs pass (= fwd matmuls) + upd pass (= fwd matmuls)
    flop_tot = 3 * flop_fwd
    print(f"  fwd+bwd MFU: {flop_tot / t2 / 197e12 * 100:.1f}% "
          f"({flop_tot/1e9:.0f} GFLOP)")
    # linearity sanity: half batch
    fwd_h = jax.jit(lambda p: cp_encode(p, factors, RES))
    th = timeit("cp_encode fwd (M/2)", lambda i: fwd_h(pos_pool[i % POOL, : M // 2]))
    print(f"  scaling fwd M/2 vs M: {th / t:.2f} (expect ~0.5)")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""March-stage micro-bisect on the real TPU: cumulative cost of each
internal stage of march_rays_turbo at eval shapes (N=16384, K=256,
K2=96, U=16). Mirrors the march body (occupancy.py:march_rays_turbo);
keep in sync when the march changes.

Relay-honest: rays vary per call, n>=20, block_until_ready."""
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
    print(f"{name:44s} {dt*1e3:9.2f} ms/call", flush=True)
    return dt


def main():
    from ngp_tpu.config import RenderConfig
    from ngp_tpu.models import occupancy as om
    from ngp_tpu.ops.rays import near_far_from_aabb

    cfg = RenderConfig(
        bound=1.0, min_near=0.05, dt_gamma=0.0, max_steps=256,
        max_samples_per_ray=32, grid_size=128, density_thresh=10.0,
        turbo=True, coarse_candidates=96, crossing_slots=16,
        compact_mean_samples=8,
    )
    N, S = 16384, 16
    rng = np.random.default_rng(0)
    state = om.init_occupancy(cfg)
    occ = jnp.asarray(rng.random((1, 128, 128, 128)) < 0.03)
    cp, fp = om.pack_occupancy_payloads(occ)
    state = state.replace(occ_grid=occ, coarse_payload=cp, fine_payload=fp)

    POOL = 8
    ro_np = np.tile(np.array([[0, 0, -2.0]], np.float32), (POOL, N, 1))
    d = rng.normal(size=(POOL, N, 3)).astype(np.float32)
    d[..., 2] = np.abs(d[..., 2]) + 1.5
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ro_all = jnp.asarray(ro_np)
    rd_all = jnp.asarray(d)

    K = om.lattice_probes(cfg)
    K2 = max(min(cfg.coarse_candidates, K), om.ALIGN)
    U = cfg.crossing_slots
    H = cfg.grid_size
    cas = cfg.cascades
    F = om.COARSE_FACTOR
    Hc = H // F
    dt_min, dt_max = om.dt_bounds(cfg)
    aabb = jnp.asarray(cfg.aabb, jnp.float32)
    print(f"shapes: N={N} K={K} K2={K2} U={U} S={S}", flush=True)

    def dt_at(t):
        if cfg.dt_gamma == 0.0:
            return jnp.full_like(t, dt_min)
        return jnp.clip(t * cfg.dt_gamma, dt_min, dt_max)

    def stage(upto):
        def run(i):
            ro = ro_all[i % POOL]
            rd = rd_all[i % POOL]
            nears, fars = near_far_from_aabb(ro, rd, aabb, cfg.min_near)
            hit = fars > nears
            fars_c = jnp.where(hit, fars, nears)
            ts, dts = om.t_lattice(nears, fars_c, cfg, None)
            if upto == "lattice":
                return ts

            def cells_at(ts_, dts_):
                x = ro[:, None, :] + rd[:, None, :] * ts_[..., None]
                x = jnp.clip(x, -cfg.bound, cfg.bound)
                level = jnp.maximum(
                    om.mip_from_pos(x, cas), om.mip_from_dt(dts_, H, cas)
                )
                mip_bound = jnp.minimum(
                    2.0 ** level.astype(jnp.float32), cfg.bound
                )
                n = jnp.clip(
                    (0.5 * (x / mip_bound[..., None] + 1.0) * H).astype(jnp.int32),
                    0, H - 1,
                )
                coarse = n // F
                flat = ((level * Hc + coarse[..., 0]) * Hc
                        + coarse[..., 1]) * Hc + coarse[..., 2]
                return n, flat

            _, flat_c = cells_at(ts, dts)
            if upto == "cells":
                return flat_c
            coarse_ok = om._coarse_lookup(state.coarse_payload, flat_c)
            if upto == "lookup":
                return coarse_ok
            valid_c = coarse_ok & (ts < fars_c[:, None]) & hit[:, None]
            tbits = jax.lax.bitcast_convert_type(ts, jnp.int32)
            key = jnp.where(valid_c, tbits, tbits + om._TKEY_INVALID)
            negv, _ = jax.lax.top_k(-key, K2)
            cand = -negv
            if upto == "topk1":
                return cand
            cmask = cand < om._TKEY_THRESH
            tbits2 = jnp.where(cmask, cand, cand - om._TKEY_INVALID)
            ts2 = jax.lax.bitcast_convert_type(tbits2, jnp.float32)
            dts2 = dt_at(ts2)
            n2, flat2 = cells_at(ts2, dts2)
            if upto == "cells2":
                return flat2
            change = jnp.concatenate(
                [jnp.ones((N, 1), bool), flat2[:, 1:] != flat2[:, :-1]], axis=1
            ) & cmask
            slot = jnp.cumsum(change.astype(jnp.int32), axis=1) - 1
            in_budget = slot < U
            slot_cl = jnp.clip(slot, 0, U - 1)
            oh_first = (slot[:, :, None] == jnp.arange(U)[None, None, :]) & change[:, :, None]
            slot_cell = jnp.max(
                jnp.where(oh_first, flat2[:, :, None], -1), axis=1
            )
            if upto == "slots":
                return slot_cell
            pay = jnp.take(
                state.fine_payload, jnp.maximum(slot_cell, 0).reshape(-1), axis=0
            ).reshape(N, U, 2)
            if upto == "paygather":
                return pay
            shifts8 = jnp.arange(4, dtype=jnp.uint32) * 8
            b0 = (pay[..., 0][..., None] >> shifts8[None, None, :]) & 0xFF
            b1 = (pay[..., 1][..., None] >> shifts8[None, None, :]) & 0xFF
            pay_bytes = jnp.concatenate([b0, b1], axis=-1).astype(jnp.bfloat16)
            oh_slot = jax.nn.one_hot(slot_cl, U, dtype=jnp.bfloat16)
            bytes_k = jnp.einsum(
                "nku,nub->nkb", oh_slot, pay_bytes,
                preferred_element_type=jnp.float32,
            )
            off = n2 % F
            bit6 = (off[..., 0] * F + off[..., 1]) * F + off[..., 2]
            oh_byte = jax.nn.one_hot(bit6 >> 3, 8, dtype=jnp.float32)
            byte_val = jnp.sum(bytes_k * oh_byte, axis=-1).astype(jnp.int32)
            fine_ok = ((byte_val >> (bit6 & 7)) & 1) > 0
            valid_f = fine_ok & cmask & in_budget
            if upto == "finebits":
                return valid_f
            key2 = jnp.where(valid_f, tbits2, tbits2 + om._TKEY_INVALID)
            negv2, _ = jax.lax.top_k(-key2, S)
            sel = -negv2
            n_total = jnp.sum(valid_f, axis=-1)
            mask = jnp.arange(S, dtype=jnp.int32)[None, :] < n_total[:, None]
            ts_c = jax.lax.bitcast_convert_type(jnp.where(mask, sel, 0), jnp.float32)
            return ts_c

        return jax.jit(run)

    names = ["lattice", "cells", "lookup", "topk1", "cells2", "slots",
             "paygather", "finebits", "full"]
    prev = 0.0
    for nm in names:
        t = timeit(nm, stage(nm))
        print(f"  delta {nm:12s} {(t-prev)*1e3:+7.2f} ms", flush=True)
        prev = t

    # reference: the real march fn at same shapes
    full = jax.jit(lambda i: om.march_rays_turbo(
        ro_all[i % POOL], rd_all[i % POOL], state, cfg, max_samples=S,
        aabb=aabb)["ts"])
    timeit("march_rays_turbo (real)", full)


if __name__ == "__main__":
    main()

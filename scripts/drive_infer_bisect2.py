#!/usr/bin/env python
"""Stage bisect of the round-4 device-side eval render: time jitted
pipelines with stages stubbed — ray gen only, march only, march +
global compaction, + density net, + color net, full render — on the
REAL trained workload (800x800, prepass t-ranges, eval dials), varied
poses per call, one lax.map dispatch per frame like the production
renderer. The deltas between consecutive variants are the stage costs
the two-round march can still attack.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from ngp_tpu.config import NetworkConfig, RenderConfig, TrainConfig
    from ngp_tpu.data.nerf_dataset import NeRFDataset
    from ngp_tpu.data.raysampler import rays_from_frame_indices
    from ngp_tpu.data.synthetic import make_synthetic_dataset
    from ngp_tpu.models import occupancy as om
    from ngp_tpu.models.nerf import NeRFNetwork
    from ngp_tpu.training.nerf_grid import GridNeRFTrainer

    H = int(os.environ.get("NGP_H", "800"))
    cache = f"/root/.ngp_infer_{H}"
    make_synthetic_dataset(cache, n_train=16, n_val=8, n_test=1, H=H, W=H)
    train_ds = NeRFDataset(cache, split="train", scale=0.8)
    val_ds = NeRFDataset(cache, split="val", scale=0.8)
    render_cfg = RenderConfig(
        bound=1.0, min_near=0.05, dt_gamma=0.0, max_steps=256,
        max_samples_per_ray=32, grid_size=128, density_thresh=10.0,
        turbo=True, coarse_candidates=96, crossing_slots=16,
        compact_mean_samples=6,
    )
    net_cfg = NetworkConfig(
        encoding="cpgrid", use_bf16=True,
        cp_resolutions=(128, 256, 512, 1024, 2048), cp_rank=128,
        cp_freq_degree=6,
    )
    train_cfg = TrainConfig(
        iters=30000, lr=1e-2, num_rays=16384, workspace="/tmp/infer_ws",
        update_extra_interval=16,
    )
    model = NeRFNetwork(cfg=net_cfg, render=render_cfg)
    trainer = GridNeRFTrainer(
        model, render_cfg, train_cfg, log_every=10**9, use_tensorboard=False
    )
    trainer.ensure_initialized()
    trainer.mark_untrained(train_ds.poses, train_ds.intrinsics,
                           train_ds.H, train_ds.W)
    epoch_iter = trainer.make_loader(train_ds)
    done = 0
    n_steps = int(os.environ.get("NGP_STEPS", "1000"))
    while done < n_steps:
        for batch in epoch_iter():
            trainer.step(batch)
            done += 1
            if done >= n_steps:
                break
    jax.block_until_ready(trainer.state.params)
    print("trained", flush=True)

    chunks = [int(c) for c in
              os.environ.get("NGP_CHUNK", "4096").split(",")]
    ems = int(os.environ.get("NGP_EMS", "6"))
    cc = int(os.environ.get("NGP_CC", "64"))
    trainer.eval_mean_samples = ems
    trainer.eval_coarse_candidates = cc
    intr = val_ds.intrinsics
    n = H * H

    # one prepass to fix span bucket + chunk count (sticky across poses)
    aabb_eff = np.asarray(render_cfg.aabb, np.float32)
    box = trainer._fetch_eval_tight_box()
    if box is not None:
        aabb_eff = np.concatenate([
            np.maximum(aabb_eff[:3], box[:3]),
            np.minimum(aabb_eff[3:], box[3:]),
        ])
        trainer._set_eval_lattice_span(aabb_eff)
    poses0 = np.asarray(val_ds.poses[0], np.float32)[None]
    pre0 = trainer._run_eval_prepass(poses0, intr, H, H, aabb_eff)
    trainer._set_eval_lattice_span_value(pre0["span"])
    span = trainer._eval_lattice_span
    cfg = dataclasses.replace(render_cfg, coarse_candidates=cc,
                              lattice_span=span)
    density_fn, color_fn, _bg = trainer._fns(trainer.eval_params())
    aabb_j = jnp.asarray(aabb_eff)

    def chunk_rays(poses, inds):
        rays = rays_from_frame_indices(
            poses, jnp.asarray(np.asarray(intr, np.float32)), H, H, inds,
            jnp.zeros_like(inds),
        )
        return rays["rays_o"], rays["rays_d"]

    def t_range_of(inds, t0f, t1f):
        return jnp.stack([jnp.take(t0f, inds), jnp.take(t1f, inds)], axis=-1)

    def march_prefix(ro, rd, state, tr, upto):
        """Inline replica of march_rays_turbo's stages up to ``upto``
        (lattice / topk1 / cells2 / cross) for stage attribution."""
        from ngp_tpu.models.occupancy import (
            _TKEY_INVALID, _TKEY_THRESH, COARSE_FACTOR, _coarse_lookup,
            dt_bounds, mip_from_dt, mip_from_pos, near_far_from_aabb,
            t_lattice,
        )
        K2 = cfg.coarse_candidates
        Hg = cfg.grid_size
        cas = cfg.cascades
        Fc = COARSE_FACTOR
        Hc = Hg // Fc
        dt_min, dt_max = dt_bounds(cfg)
        nears, fars = near_far_from_aabb(ro, rd, aabb_j, cfg.min_near)
        nears = jnp.maximum(nears, tr[:, 0])
        fars = jnp.minimum(fars, tr[:, 1])
        hit = fars > nears
        fars_c = jnp.where(hit, fars, nears)
        ts, dts = t_lattice(nears, fars_c, cfg, None)

        def cells_at(ts_, dts_):
            x = ro[:, None, :] + rd[:, None, :] * ts_[..., None]
            x = jnp.clip(x, -cfg.bound, cfg.bound)
            level = jnp.maximum(mip_from_pos(x, cas),
                                mip_from_dt(dts_, Hg, cas))
            mip_bound = jnp.minimum(2.0 ** level.astype(jnp.float32),
                                    cfg.bound)
            nq = jnp.clip(
                (0.5 * (x / mip_bound[..., None] + 1.0) * Hg).astype(
                    jnp.int32), 0, Hg - 1,
            )
            coarse = nq // Fc
            flat = ((level * Hc + coarse[..., 0]) * Hc
                    + coarse[..., 1]) * Hc + coarse[..., 2]
            return nq, flat

        _, flat_c = cells_at(ts, dts)
        coarse_ok = _coarse_lookup(state.coarse_payload, flat_c)
        valid_c = coarse_ok & (ts < fars_c[:, None]) & hit[:, None]
        if upto == "lattice":
            return jnp.sum(valid_c)
        tbits = jax.lax.bitcast_convert_type(ts, jnp.int32)
        key = jnp.where(valid_c, tbits, tbits + _TKEY_INVALID)
        negv, _ = jax.lax.top_k(-key, K2)
        cand = -negv
        cmask = cand < _TKEY_THRESH
        tbits2 = jnp.where(cmask, cand, cand - _TKEY_INVALID)
        if upto == "topk1":
            return jnp.sum(tbits2)
        ts2 = jax.lax.bitcast_convert_type(tbits2, jnp.float32)
        dts2 = jnp.clip(ts2 * cfg.dt_gamma, dt_min, dt_max) \
            if cfg.dt_gamma else jnp.full_like(ts2, dt_min)
        n2, flat2 = cells_at(ts2, dts2)
        if upto == "cells2":
            return jnp.sum(flat2)
        U = cfg.crossing_slots
        change = jnp.concatenate(
            [jnp.ones((ro.shape[0], 1), bool), flat2[:, 1:] != flat2[:, :-1]],
            axis=1) & cmask
        slot = jnp.cumsum(change.astype(jnp.int32), axis=1) - 1
        in_budget = slot < U
        slot_cl = jnp.clip(slot, 0, U - 1)
        oh_first = (slot[:, :, None] == jnp.arange(U)[None, None, :]) \
            & change[:, :, None]
        slot_cell = jnp.max(jnp.where(oh_first, flat2[:, :, None], -1),
                            axis=1)
        pay = jnp.take(
            state.fine_payload, jnp.maximum(slot_cell, 0).reshape(-1),
            axis=0).reshape(ro.shape[0], U, -1)
        shifts8 = jnp.arange(4, dtype=jnp.uint32) * 8
        b0 = (pay[..., 0][..., None] >> shifts8[None, None, :]) & 0xFF
        b1 = (pay[..., 1][..., None] >> shifts8[None, None, :]) & 0xFF
        pay_bytes = jnp.concatenate([b0, b1], axis=-1).astype(jnp.bfloat16)
        oh_slot = jax.nn.one_hot(slot_cl, U, dtype=jnp.bfloat16)
        bytes_k = jnp.einsum("nku,nub->nkb", oh_slot, pay_bytes,
                             preferred_element_type=jnp.float32)
        off = n2 % Fc
        bit6 = (off[..., 0] * Fc + off[..., 1]) * Fc + off[..., 2]
        oh_byte = jax.nn.one_hot(bit6 >> 3, 8, dtype=jnp.float32)
        byte_val = jnp.sum(bytes_k * oh_byte, axis=-1).astype(jnp.int32)
        fine_ok = ((byte_val >> (bit6 & 7)) & 1) > 0
        valid_f = fine_ok & cmask & in_budget
        return jnp.sum(valid_f)  # upto == "cross"

    def make_variant(kind, chunk, budget):
        @jax.jit
        def fn(params, aux, poses, di, t0f, t1f):
            state = aux["occ"]

            def one(inds):
                ro, rd = chunk_rays(poses, inds)
                if kind == "rays":
                    return jnp.sum(rd)
                tr = t_range_of(inds, t0f, t1f)
                if kind in ("lattice", "topk1", "cells2", "cross"):
                    return march_prefix(ro, rd, state, tr, kind)
                if kind == "march":
                    m = om.march_rays_turbo(ro, rd, state, cfg, aabb=aabb_j,
                                            t_range=tr)
                    return jnp.sum(m["ts"])
                if kind == "direct":
                    # no-compaction render: static per-ray cap = ems
                    # rounded to ALIGN (the water-fill level a 6N budget
                    # typically lands on is 8)
                    out = om.render_rays_grid_turbo_direct(
                        density_fn, color_fn, ro, rd, state, cfg,
                        max_samples=max(om.ALIGN, -(-ems // om.ALIGN)
                                        * om.ALIGN),
                        aabb=aabb_j, t_range=tr,
                    )
                    return jnp.sum(out["image"]) + jnp.sum(out["depth"])
                geo = om._turbo_compact_geometry(
                    ro, rd, state, cfg, None, False, None, aabb_j, budget,
                    t_range=tr,
                )
                m, S, bdg, src, valid_m, offsets, t_c, pts, dirs, maskb = geo
                if kind == "geom":
                    return jnp.sum(t_c)
                sigmas, g = density_fn(pts)
                if kind == "dens":
                    return jnp.sum(sigmas)
                rgbs = color_fn(dirs, g)
                if kind == "nets":
                    return jnp.sum(sigmas) + jnp.sum(rgbs)
                vals = jnp.concatenate(
                    [sigmas.reshape(-1, 1).astype(jnp.float32),
                     rgbs.astype(jnp.float32)], axis=-1,
                )
                placed = om.place_compact(vals, offsets, src, S)
                out = om.composite_rays(
                    placed[..., 0], placed[..., 1:], m["ts"], m["deltas"],
                    maskb, m["nears"], m["fars"],
                    density_scale=cfg.density_scale, t_thresh=cfg.t_thresh,
                )
                return jnp.sum(out["image"]) + jnp.sum(out["depth"])

            return jax.lax.map(one, di)

        return fn

    mode = os.environ.get("NGP_MODE", "")
    if mode == "march":
        variants = ["rays", "lattice", "topk1", "cells2", "cross", "march"]
    elif mode == "all":
        variants = ["rays", "lattice", "topk1", "cells2", "cross", "march",
                    "geom", "dens", "nets", "full", "direct"]
    else:
        variants = ["rays", "march", "geom", "dens", "nets", "full",
                    "direct"]
    params = trainer.eval_params()

    for chunk in chunks:
        C = max(1, -(-pre0["count"] // chunk))
        C = -(-C // 16) * 16 + 16  # headroom: later poses reuse the trace
        C = min(C, max(1, -(-n // chunk)))
        print(f"chunk {chunk}: count {pre0['count']} C {C} span {span}",
              flush=True)
        budget = chunk * ems
        fns = {k: make_variant(k, chunk, budget) for k in variants}

        def run(kind, pose_i):
            poses = np.asarray(val_ds.poses[pose_i], np.float32)[None]
            pre = trainer._run_eval_prepass(poses, intr, H, H, aabb_eff)
            di, _ = trainer._sorted_chunk_slices(pre["sorted_inds"], C, chunk)
            t0 = time.perf_counter()
            out = fns[kind](params, trainer.aux, jnp.asarray(poses), di,
                            pre["t0"], pre["t1"])
            jax.block_until_ready(out)
            return time.perf_counter() - t0

        for kind in variants:
            run(kind, 0)  # compile
            ts = [run(kind, 1 + i % 7) for i in range(5)]
            print(f"{kind:6s} {np.median(ts)*1000:7.0f} ms/frame "
                  f"(min {min(ts)*1000:.0f})", flush=True)


if __name__ == "__main__":
    main()

"""Occupancy-grid accelerated NeRF trainer (the ``-O`` path).

TPU-native equivalent of training with ``--cuda_ray``: the render
inside the jitted train step goes through the fixed-shape masked
marcher (:mod:`ngp_tpu.models.occupancy`), and every
``update_extra_interval`` steps the host loop triggers a jitted
density-grid refresh (the reference's update_extra_state cadence,
nerf/utils.py:853-856).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

import math

import numpy as np

from ngp_tpu.models.occupancy import (
    SQRT3,
    OccupancyState,
    init_occupancy,
    mark_untrained_grid,
    occupied_aabb,
    pack_occupancy_payloads,
    pack_prepass_payload,
    render_rays_grid,
    render_rays_grid_turbo,
    render_rays_grid_turbo_direct,
    update_occupancy,
)
from ngp_tpu.training.nerf import NeRFTrainer


class GridNeRFTrainer(NeRFTrainer):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.use_grid = True
        self._jit_update_occ = None
        # optional smaller per-ray sample budget for evaluation/test
        # rendering (trades a little PSNR for frame rate; None = the
        # training budget)
        self.eval_max_samples: Optional[int] = None
        # turbo eval: GLOBAL mean-samples-per-ray budget for frame
        # rendering. render_frame interleaves the frame's rays so each
        # chunk sees frame-average occupancy, and the budget is
        # WATER-FILLED across rays (occupancy._turbo_compact_geometry),
        # so a scarce budget trims the deepest samples of the longest
        # rays first and degrades gracefully (None = full no-drop
        # budget). Default 6, re-measured round 5: the prepass's
        # device-side chunk lists made eval chunks ALL-HIT, so the
        # water level now ~= ems exactly (r4's knee of 4 assumed ~45%
        # background rays donating budget). Converged 800x800 flagship:
        # ems6 = 35.03 dB (>= the no-drop 35.05 within noise), ems8
        # +0.17 dB at +20%, ems4 COLLAPSES to 32.5.
        self.eval_mean_samples: Optional[int] = 6
        # eval-only probe-lattice stride: >1 marches the frame with
        # max_steps/stride probes (dt_min grows by the stride) — the
        # march's fixed per-chunk cost (coarse lookup + selection) drops
        # ~linearly; a converged occupancy grid keeps the quality cost
        # small. The TPU analog of the reference inference loop's
        # larger effective steps once rays die (renderer.py:336-367).
        self.eval_probe_stride: int = 1
        # eval-only march-budget overrides (None = training config).
        # The march bisect (scripts/microbench_evalpath.py) puts ~40%
        # of the eval chunk in the march; its candidate top_k, crossing
        # one-hots and fine-payload gathers all scale with these two
        # budgets, and an eval frame needs fewer of both than training
        # (rays are frame-shuffled, the grid is converged). Candidate
        # budget 64 measured PSNR-identical to the training 96 on the
        # converged synthetic scene; overflow shows up in the march's
        # n_dropped counter if a denser scene ever needs it raised.
        self.eval_coarse_candidates: Optional[int] = 64
        self.eval_crossing_slots: Optional[int] = None
        # eval-only transmittance-proxy early-out (RenderConfig
        # t_proxy_thresh): march candidates whose grid-estimated
        # transmittance is below this never reach the network — the
        # reference inference loop's dead-ray early termination
        # (raymarching.cu:834-850). None = off.
        self.eval_t_proxy: Optional[float] = None
        # tight eval marching: clip per-ray [near, far] to the occupied
        # region's AABB and shrink the static probe lattice to its
        # diameter (occupancy.occupied_aabb + cfg.lattice_span). Every
        # sample the full lattice could produce lies in an occupied
        # cell inside that box, so this only removes probes that never
        # produced samples. The span is quantized to 1/8ths of the full
        # chord so the cached eval trace survives small box changes.
        self.eval_tight_march: bool = True
        self._eval_lattice_span: Optional[float] = None
        self._tight_box_for = None  # occ state the cached box belongs to
        self._tight_box_cache = None
        # two-round eval march: a cheap conservative prepass
        # (occupancy.ray_prepass) culls never-hit rays from the frame
        # and gives the hits per-ray [t0, t1] march intervals — the TPU
        # equivalent of the reference's alive-ray compaction loop
        # (nerf/renderer.py:336-367) at frame granularity
        self.eval_prepass: bool = True
        # direct (no-compaction) eval render: a STATIC per-ray sample
        # cap (eval_direct_cap, ALIGN-multiple; None = exact, i.e.
        # cfg.max_samples_per_ray) replaces the global
        # water-filled budget — the
        # march's ascending-t prefix IS the compaction, so the N*S
        # compaction sort (the render's only super-linear stage, the
        # reason eval chunks were pinned at 4096) disappears and huge
        # chunks amortize the ~0.3 ms/chunk lax.map iteration floor.
        # Padding waste (network evals on masked slots of short rays)
        # is the trade; span-bucketed chunk lists bound it.
        self.eval_direct: bool = False
        self.eval_direct_cap: Optional[int] = None
        # prepass PIXEL stride: >1 probes every s-th pixel in x and y
        # (s^2 fewer prepass rays) and reconstructs full-res hit/[t0,
        # t1] by a 3x3 probe-neighborhood dilation (hit = any, t0 =
        # min - h, t1 = max + h). Conservative by the same argument as
        # stride 1: a full-res ray is within (s/sqrt2) px of a probed
        # ray, i.e. < 0.02 world units at s<=8 across the scene — far
        # inside the payload's 3^3 coarse-cell dilation ball (h ~
        # 2*bound/32) that already covers the probe lattice's h/2
        # along-ray gap; the extra +-h on t0/t1 covers the cross-ray
        # offset. Default 2, measured round 5 (converged 800x800
        # flagship, device time from the profiler's XLA Module spans):
        # prepass 17.7 -> 9.8 ms/frame with PSNR +0.08 (35.11 vs
        # 35.03) — the dilation's extra conservatism only ADDS
        # candidate samples.
        self.eval_prepass_stride: int = 2
        self._jit_prepass = {}
        self._prepass_inds_cache = {}

    def init_aux(self) -> Any:
        return {"occ": init_occupancy(self.render_cfg)}

    def render_batch(
        self, params, rays_o, rays_d, rng=None, perturb=False, bg_color=None,
        aux=None, aabb=None, t_range=None,
    ):
        density_fn, color_fn, bg_fn = self._fns(params)
        occ = aux["occ"] if aux is not None else init_occupancy(self.render_cfg)
        # fused eval radiance head (one Pallas pass over the whole
        # network — sigma, SH, color MLP, activations; inference only)
        vals_fn = None if perturb else self._eval_vals_fn(params)
        return self._render_with(
            density_fn, color_fn, bg_fn, occ, rays_o, rays_d,
            rng=rng, perturb=perturb, bg_color=bg_color, aabb=aabb,
            t_range=t_range, vals_fn=vals_fn,
        )

    def _render_with(
        self, density_fn, color_fn, bg_fn, occ, rays_o, rays_d,
        rng=None, perturb=False, bg_color=None, aabb=None, t_range=None,
        return_geo=False, vals_fn=None,
    ):
        """Shared dial-aware dispatch onto the turbo / v1 grid
        renderers; subclasses with their own heads/occupancy slicing
        (D-NeRF) reuse the eval-dial logic through this."""
        # eval-budget override only applies outside training steps
        # (training passes rng+perturb)
        max_samples = None if perturb else self.eval_max_samples
        cfg = self.render_cfg
        if not perturb:
            import dataclasses

            over = {}
            if self.eval_probe_stride > 1:
                over["max_steps"] = max(
                    cfg.max_steps // self.eval_probe_stride, 16
                )
            if self.eval_coarse_candidates is not None:
                over["coarse_candidates"] = int(self.eval_coarse_candidates)
            if self.eval_crossing_slots is not None:
                over["crossing_slots"] = int(self.eval_crossing_slots)
            if self.eval_t_proxy is not None:
                over["t_proxy_thresh"] = float(self.eval_t_proxy)
            if self._eval_lattice_span is not None and cfg.turbo:
                over["lattice_span"] = float(self._eval_lattice_span)
            if over:
                cfg = dataclasses.replace(cfg, **over)
        if (
            self.render_cfg.turbo
            and not perturb
            and self.eval_direct
            and bg_fn is None
        ):
            from ngp_tpu.models.occupancy import ALIGN

            # default static cap: EXACT (the march's own per-ray
            # maximum) — enabling eval_direct alone changes nothing
            # numerically; the cap is an explicit perf dial. Deriving
            # it from eval_mean_samples was a trap: the compacted
            # path's water-fill level routinely sits well above the
            # mean (empty rays donate budget), so cap=ems or 2*ems
            # truncates every dense ray (measured on the 200^2 verify
            # scene: cap 8 reads 25.4 dB where cap 16 reads 30.1 and
            # the ems-4 compacted path 26.7)
            cap = self.eval_direct_cap or cfg.max_samples_per_ray
            cap = -(-cap // ALIGN) * ALIGN
            return render_rays_grid_turbo_direct(
                density_fn, color_fn, rays_o, rays_d, occ, cfg,
                bg_color=bg_color, max_samples=int(cap), aabb=aabb,
                t_range=t_range,
            )
        if self.render_cfg.turbo:
            # eval budget: eval_mean_samples per ray on average (safe —
            # render_frame shuffles rays so chunks are frame-average);
            # eval_mean_samples=None means the full no-drop budget N*S.
            # TRAINING steps leave budget=None here, which
            # render_rays_grid_turbo resolves to the (dropping)
            # N * cfg.compact_mean_samples budget — the reference's
            # mean_count cap (raymarching.py:198-203). Overflow is
            # WATER-FILLED (occupancy._turbo_compact_geometry): every
            # ray keeps its nearest samples up to a uniform depth
            # allowance, so a dense early-training grid shortens all
            # rays instead of zeroing trailing ones.
            budget = None
            if not perturb:
                S = max_samples or cfg.max_samples_per_ray
                ems = self.eval_mean_samples
                budget = rays_o.shape[0] * (S if ems is None else min(ems, S))
            return render_rays_grid_turbo(
                density_fn, color_fn, rays_o, rays_d, occ, cfg,
                rng=rng, perturb=perturb, bg_color=bg_color, bg_fn=bg_fn,
                max_samples=max_samples, budget=budget, aabb=aabb,
                t_range=t_range, return_geo=return_geo,
                vals_fn=None if (perturb or return_geo) else vals_fn,
            )
        return render_rays_grid(
            density_fn,
            color_fn,
            rays_o,
            rays_d,
            occ,
            cfg,
            rng=rng,
            perturb=perturb,
            bg_color=bg_color,
            bg_fn=bg_fn,
            max_samples=max_samples,
            aabb=aabb,
            t_range=t_range,
            return_geo=return_geo,
        )

    def _fetch_eval_tight_box(self):
        """Occupied-region AABB [6] (host numpy) for tight eval
        marching, or None when unavailable. Cached per occupancy state
        (one [6]-element device fetch per grid refresh, not per
        frame)."""
        if not (self.render_cfg.turbo and self.eval_tight_march):
            return None
        occ = (self.aux or {}).get("occ")
        if occ is None or getattr(occ, "occ_grid", None) is None:
            return None
        if occ.occ_grid.ndim != 4:  # time-sliced (D-NeRF) state
            return None
        if self._tight_box_for is not occ:
            self._tight_box_cache = np.asarray(
                occupied_aabb(occ, self.render_cfg), np.float32
            )
            self._tight_box_for = occ
        return self._tight_box_cache

    def _set_eval_lattice_span(self, aabb_eff: np.ndarray) -> None:
        """Quantize the effective eval box's diameter into the static
        lattice-span bucket read by render_batch at trace time."""
        cfg = self.render_cfg
        chord = 2.0 * SQRT3 * cfg.bound
        span = float(np.linalg.norm(np.maximum(aabb_eff[3:] - aabb_eff[:3], 0)))
        q = chord / 8.0
        bucket = min(math.ceil(max(span, q) / q) * q, chord)
        self._eval_lattice_span = None if bucket >= chord else bucket

    def _set_eval_lattice_span_value(self, span: float) -> None:
        """Like :meth:`_set_eval_lattice_span` but from a measured
        per-ray span scalar (the prepass's longest [t0, t1] interval) —
        finer 1/16-chord buckets, since the per-ray span is usually
        much shorter than the occupied box's diameter.

        STICKY-MAX: the bucket only ever grows. Per-pose span jitter
        (1.50 vs 1.62 on adjacent validation poses, measured) would
        otherwise flip the bucket and retrace the cached renderer
        mid-eval at 15-18 s per retrace; a larger span is always
        conservative (probes outside the true interval produce no
        samples), so keeping the max seen trades <=1 lattice probe of
        slack for zero retraces."""
        cfg = self.render_cfg
        chord = 2.0 * SQRT3 * cfg.bound
        q = chord / 16.0
        bucket = min(math.ceil(max(float(span), q) / q) * q, chord)
        prev = getattr(self, "_span_sticky", 0.0)
        bucket = max(bucket, prev)
        self._span_sticky = bucket
        self._eval_lattice_span = None if bucket >= chord else bucket

    def _prepass_occ(self, aux, tval):
        """Occupancy state the eval prepass probes; D-NeRF overrides to
        slice its time-sliced state at the frame's time."""
        return aux["occ"]

    def _run_eval_prepass(self, poses, intrinsics, H: int, W: int, aabb_eff,
                          times=None):
        """Frame-level eval cull (see occupancy.ray_prepass): returns a
        dict or None when the prepass doesn't apply.

        Keys: "t0"/"t1" (flat per-(frame, pixel) device arrays),
        "span" (longest hit interval, float). Single-frame calls
        (F == 1, the default group) additionally get the fully
        DEVICE-SIDE chunk-index form — "sorted_inds" ([n] i32 device:
        the frame permutation stably sorted hit-first, so its prefix is
        exactly the culled chunk list; built on device because
        uploading host-culled indices measured 70-170 ms/frame through
        the tunnel) and "count" (number of hit rays) — while F > 1
        callers get "hit" ([F, n] bool numpy) for the host-side path."""
        cfg = self.render_cfg
        if not (self.eval_prepass and cfg.turbo):
            return None
        # bg_radius > 0 no longer disables the cull: misses get the
        # background net through render_frames' bg-only pass
        # (_render_bg_frames) instead of the full march — the
        # reference's run_cuda composites bg for dead rays the same way
        # (nerf/renderer.py:271-274, :316)
        occ = (self.aux or {}).get("occ")
        if occ is None or getattr(occ, "prepass_payload", None) is None:
            return None
        time_sliced = occ.occ_grid.ndim != 4
        if time_sliced and not getattr(self, "_prepass_time_sliced", False):
            return None
        import dataclasses

        from ngp_tpu.data.raysampler import rays_from_frame_indices
        from ngp_tpu.models.occupancy import ray_prepass

        F = int(np.asarray(poses).shape[0])
        if time_sliced and F != 1:
            return None  # one payload slice per dispatch (group=1)
        n = H * W
        s = max(int(getattr(self, "eval_prepass_stride", 1)), 1)
        # subsampled probe grid (see eval_prepass_stride): every s-th
        # pixel, last row/col clamped so the grid covers the frame edge
        Hs, Ws = -(-H // s), -(-W // s)
        ns = Hs * Ws
        chunk = 65536
        Cp = -(-F * ns // chunk)
        ikey = (F, n, chunk, s)
        if ikey in self._prepass_inds_cache:
            di, df = self._prepass_inds_cache[ikey]
        else:
            if s == 1:
                inds1 = np.arange(n, dtype=np.int32)
            else:
                rows = np.minimum(np.arange(Hs, dtype=np.int32) * s, H - 1)
                cols = np.minimum(np.arange(Ws, dtype=np.int32) * s, W - 1)
                inds1 = (rows[:, None] * W + cols[None, :]).reshape(-1)
            inds = np.tile(inds1, F)
            fid = np.repeat(np.arange(F, dtype=np.int32), ns)
            pad = Cp * chunk - F * ns
            if pad:
                inds = np.concatenate([inds, np.full(pad, inds[-1], np.int32)])
                fid = np.concatenate([fid, np.full(pad, fid[-1], np.int32)])
            di = jnp.asarray(inds.reshape(Cp, chunk))
            df = jnp.asarray(fid.reshape(Cp, chunk))
            self._prepass_inds_cache[ikey] = (di, df)
        # the prepass marches the tight-box span set just above by
        # render_frames (the per-ray spans it produces then shrink the
        # MAIN march's bucket below it)
        span = self._eval_lattice_span
        pkey = (Cp, chunk, H, W, span, F, s)
        perm_key = ("dev_perm", n)
        if perm_key not in self._prepass_inds_cache:
            self._prepass_inds_cache[perm_key] = jnp.asarray(
                self._frame_perm(n).astype(np.int32)
            )
        perm_dev = self._prepass_inds_cache[perm_key]
        if pkey not in self._jit_prepass:
            pcfg = dataclasses.replace(cfg, lattice_span=span)
            from ngp_tpu.models.occupancy import prepass_spacing

            h_sp = prepass_spacing(pcfg)

            @jax.jit
            def prepass_fn(aux, poses_d, intr, inds_chunks, fids_chunks, aabb,
                           tval, perm):
                occ_s = self._prepass_occ(aux, tval)

                def one(args):
                    inds, fids = args
                    rays = rays_from_frame_indices(
                        poses_d, intr, H, W, inds, fids
                    )
                    out = ray_prepass(
                        rays["rays_o"], rays["rays_d"], occ_s, pcfg, aabb=aabb
                    )
                    return (
                        out["hit"],
                        jnp.where(out["hit"], out["t0"], 0.0),
                        jnp.where(out["hit"], out["t1"], 0.0),
                    )

                hits, t0s, t1s = jax.lax.map(
                    one, (inds_chunks, fids_chunks)
                )
                if s > 1:
                    # stride reconstruction: dilate over the 3x3 probe
                    # neighborhood (hit = any, t0 = min - h, t1 = max +
                    # h — the +-h covers the <= s-pixel cross-ray
                    # offset, far below one coarse cell at s <= 8),
                    # then nearest-upsample to full resolution
                    Hs_, Ws_ = Hs, Ws
                    hit_g = hits.reshape(-1)[: F * ns].reshape(F, Hs_, Ws_)
                    t0_g = jnp.where(
                        hit_g,
                        t0s.reshape(-1)[: F * ns].reshape(F, Hs_, Ws_),
                        jnp.inf,
                    )
                    t1_g = jnp.where(
                        hit_g,
                        t1s.reshape(-1)[: F * ns].reshape(F, Hs_, Ws_),
                        -jnp.inf,
                    )

                    def pool(x, init, op):
                        return jax.lax.reduce_window(
                            x, init, op, (1, 3, 3), (1, 1, 1), "SAME"
                        )

                    hit_d = pool(
                        hit_g.astype(jnp.float32), -jnp.inf, jax.lax.max
                    ) > 0.0
                    t0_d = pool(t0_g, jnp.inf, jax.lax.min) - h_sp
                    t1_d = pool(t1_g, -jnp.inf, jax.lax.max) + h_sp
                    rmap = jnp.arange(H, dtype=jnp.int32) // s
                    cmap = jnp.arange(W, dtype=jnp.int32) // s
                    hit_full = hit_d[:, rmap][:, :, cmap]
                    t0_full = jnp.where(
                        hit_full, t0_d[:, rmap][:, :, cmap], 0.0
                    )
                    t1_full = jnp.where(
                        hit_full, t1_d[:, rmap][:, :, cmap], 0.0
                    )
                    hit_flat_all = hit_full.reshape(F, n)
                    t0_out = t0_full.reshape(-1)
                    t1_out = t1_full.reshape(-1)
                    spans_all = jnp.where(
                        hit_full, t1_full - t0_full, 0.0
                    )
                else:
                    hit_flat_all = hits.reshape(-1)[: F * n].reshape(F, n)
                    t0_out = t0s.reshape(-1)
                    t1_out = t1s.reshape(-1)
                    spans_all = jnp.where(hits, t1s - t0s, 0.0)
                if F == 1:
                    # device-side chunk list: permutation stably sorted
                    # hit-first (prefix = exactly the hit rays, in the
                    # frame-shuffle order the budget sharing relies on)
                    hit_flat = hit_flat_all.reshape(-1)[:n]
                    key = (~hit_flat[perm]).astype(jnp.int32)
                    _, sorted_inds = jax.lax.sort(
                        (key, perm), num_keys=1, is_stable=True
                    )
                    count = jnp.sum(hit_flat.astype(jnp.int32))
                    meta = jnp.stack(
                        [count.astype(jnp.float32), jnp.max(spans_all)]
                    )
                    return hit_flat_all, t0_out, t1_out, meta, sorted_inds
                meta = jnp.stack([jnp.float32(0.0), jnp.max(spans_all)])
                return hit_flat_all, t0_out, t1_out, meta, perm

            self._jit_prepass[pkey] = prepass_fn
        t0v = 0.0 if times is None else float(np.asarray(times).reshape(-1)[0])
        hits, t0s, t1s, meta, sorted_inds = self._jit_prepass[pkey](
            self.aux,
            jnp.asarray(np.asarray(poses, np.float32)),
            jnp.asarray(np.asarray(intrinsics, np.float32)),
            di, df, jnp.asarray(aabb_eff, jnp.float32),
            jnp.float32(t0v), perm_dev,
        )
        meta_np = np.asarray(meta)  # ONE 8-byte sync between the rounds
        out = {
            "t0": t0s.reshape(-1),
            "t1": t1s.reshape(-1),
            "span": float(meta_np[1]),
        }
        if F == 1:
            out["sorted_inds"] = sorted_inds
            out["count"] = int(meta_np[0])
        else:
            out["hit"] = np.asarray(hits).reshape(F, n)
        return out

    # ---- occupancy maintenance -------------------------------------------

    def _update_occupancy(self):
        if self._jit_update_occ is None:
            def upd(params, occ: OccupancyState, rng):
                density_fn = self._fns(params)[0]
                return update_occupancy(
                    occ,
                    density_fn,
                    self.render_cfg,
                    rng,
                    density_scale=self.render_cfg.density_scale,
                )

            self._jit_update_occ = jax.jit(upd, donate_argnums=(1,))
        self.rng, k = jax.random.split(self.rng)
        self.aux = dict(self.aux)
        self.aux["occ"] = self._jit_update_occ(self.state.params, self.aux["occ"], k)

    def on_step_begin(self):
        if self.global_step % self.train_cfg.update_extra_interval == 0:
            self._update_occupancy()

    def _post_restore(self, skipped_keys: list) -> None:
        """Rebuild the turbo march's packed payloads when a tolerant
        checkpoint restore skipped them (pre-round-4 checkpoints lack
        prepass_payload and carry the narrow [R,2] fine_payload): the
        payloads are pure functions of the restored density/occ grids."""
        if not any("occ" in k and "payload" in k for k in skipped_keys):
            return
        occ = (self.aux or {}).get("occ")
        if occ is None or getattr(occ, "occ_grid", None) is None:
            return

        def repack(og, dg):
            cp, fp = pack_occupancy_payloads(og, dg)
            return cp, fp, pack_prepass_payload(og)

        if occ.occ_grid.ndim == 5:  # time-sliced (D-NeRF) state
            repack = jax.vmap(repack)
        cp, fp, pp = jax.jit(repack)(occ.occ_grid, occ.density_grid)
        self.aux = dict(self.aux)
        self.aux["occ"] = occ.replace(
            coarse_payload=cp, fine_payload=fp, prepass_payload=pp
        )

    def reset_extra_state(self):
        """Zero the density grid and counters (renderer.py:113-123)."""
        self.ensure_initialized()
        self.aux = dict(self.aux)
        self.aux["occ"] = init_occupancy(self.render_cfg)

    def mark_untrained(self, poses, intrinsics, H_img: int, W_img: int):
        """Call once before training (trainer.train hook in the
        reference, nerf/utils.py:639-640)."""
        self.ensure_initialized()
        self.aux = dict(self.aux)
        self.aux["occ"] = mark_untrained_grid(
            self.aux["occ"], jnp.asarray(poses), jnp.asarray(intrinsics),
            H_img, W_img, self.render_cfg,
        )

    def train_on_dataset(self, train_ds, valid_ds=None, max_epochs: int = 1):
        self.ensure_initialized()
        if self.epoch == 0:  # fresh run: cull never-seen cells
            self.mark_untrained(
                train_ds.poses, train_ds.intrinsics, train_ds.H, train_ds.W
            )
        super().train_on_dataset(train_ds, valid_ds, max_epochs)

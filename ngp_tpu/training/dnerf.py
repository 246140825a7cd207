"""D-NeRF workload trainer: time-sliced occupancy grid + deform reg.

TPU-native equivalent of ``dnerf/utils.py`` + the dynamic parts of
``dnerf/renderer.py``: the density grid gains a time axis [T, CAS,
H^3] (renderer.py:92), time stamps (i+0.5)/T with ±0.5/T jitter during
updates (renderer.py:99, :492), marching indexes the slice
floor(time*T) (renderer.py:285), grid updates sweep all slices and
FREEZE after 100 iterations (renderer.py:500-543), and training adds
an L1 penalty on the predicted deformation (dnerf/utils.py:117-119).
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ngp_tpu.config import RenderConfig
from ngp_tpu.data.raysampler import rays_from_indices, sample_ray_indices
from ngp_tpu.models.occupancy import (
    OccupancyState,
    composite_rays,
    march_rays,
    update_occupancy,
)

from ngp_tpu.training.nerf_grid import GridNeRFTrainer
from ngp_tpu.training.state import apply_gradients, create_train_state


@flax.struct.dataclass
class TimeOccupancyState:
    """[T]-sliced density grids (dnerf/renderer.py:92-100).

    ``coarse_payload``/``fine_payload`` stack the turbo march's packed
    occupancy payloads per slice (None on the v1 path) so the flagship
    matmul march serves dynamic scenes too: the CUDA kernel indexes its
    bitfield by floor(time*T) (dnerf/renderer.py:283-285); here the
    payload slice is a dynamic_slice on the traced time."""

    density_grid: jnp.ndarray  # [T, CAS, H, H, H]
    occ_grid: jnp.ndarray  # [T, CAS, H, H, H] bool
    mean_density: jnp.ndarray
    iter_density: jnp.ndarray
    coarse_payload: jnp.ndarray | None = None  # [T, rows, 128]
    fine_payload: jnp.ndarray | None = None  # [T, CAS*Hc^3, 2] u32


def init_time_occupancy(cfg: RenderConfig) -> TimeOccupancyState:
    H, cas, T = cfg.grid_size, cfg.cascades, cfg.time_size
    occ = jnp.ones((T, cas, H, H, H), jnp.bool_)
    cp = fp = None
    if cfg.turbo:
        from ngp_tpu.models.occupancy import pack_occupancy_payloads

        # all slices start identical (fully occupied): pack once
        cp1, fp1 = pack_occupancy_payloads(occ[0])
        cp = jnp.broadcast_to(cp1[None], (T,) + cp1.shape)
        fp = jnp.broadcast_to(fp1[None], (T,) + fp1.shape)
    return TimeOccupancyState(
        density_grid=jnp.zeros((T, cas, H, H, H), jnp.float32),
        occ_grid=occ,
        mean_density=jnp.float32(0.0),
        iter_density=jnp.int32(0),
        coarse_payload=cp,
        fine_payload=fp,
    )


def slice_at_time(state: TimeOccupancyState, time, cfg: RenderConfig) -> OccupancyState:
    """Static-scene view of the slice nearest ``time``
    (dnerf/renderer.py:285)."""
    t_idx = jnp.clip(
        jnp.floor(time * cfg.time_size).astype(jnp.int32), 0, cfg.time_size - 1
    )
    return OccupancyState(
        density_grid=state.density_grid[t_idx],
        occ_grid=state.occ_grid[t_idx],
        mean_density=state.mean_density,
        iter_density=state.iter_density,
        coarse_payload=(
            None if state.coarse_payload is None
            else jax.lax.dynamic_index_in_dim(
                state.coarse_payload, t_idx, keepdims=False
            )
        ),
        fine_payload=(
            None if state.fine_payload is None
            else jax.lax.dynamic_index_in_dim(
                state.fine_payload, t_idx, keepdims=False
            )
        ),
    )


class DNeRFTrainer(GridNeRFTrainer):
    """Trainer for DNeRFNetwork / DNeRFBasisNetwork models."""

    deform_reg_weight: float = 1e-3  # dnerf/utils.py:117-119
    freeze_after: int = 100  # dnerf/renderer.py:500

    def init_aux(self) -> Any:
        return {"occ": init_time_occupancy(self.render_cfg)}

    def init_state(self, rng):
        x0 = jnp.zeros((8, 3))
        d0 = jnp.concatenate([jnp.ones((8, 1)), jnp.zeros((8, 2))], axis=-1)
        params = self.model.init(
            rng, x0, d0, 0.0, method=type(self.model).full_init
        )
        return create_train_state(params, self.tx, use_ema=self.ema_decay is not None)

    # ---- rendering --------------------------------------------------------

    def _time_fns(self, params, time):
        model = self.model

        def density_fn(x):
            sigma, geo, dx = model.apply(
                params, x, time, method=type(model).density
            )
            return sigma, (geo, dx)

        def color_fn(d, geo_pack):
            geo, _ = geo_pack
            return model.apply(params, d, geo, method=type(model).color)

        return density_fn, color_fn

    def render_batch(
        self, params, rays_o, rays_d, rng=None, perturb=False, bg_color=None,
        aux=None, time=0.0,
    ):
        occ = aux["occ"] if aux is not None else init_time_occupancy(self.render_cfg)
        occ_slice = slice_at_time(occ, time, self.render_cfg)
        density_fn, color_fn = self._time_fns(params, time)
        if self.render_cfg.turbo:
            # flagship matmul march on the time slice; geometry aux
            # (deform dx) comes back for the compact batch
            from ngp_tpu.models.occupancy import render_rays_grid_turbo

            max_samples = None if perturb else self.eval_max_samples
            budget = None
            if not perturb:
                S = max_samples or self.render_cfg.max_samples_per_ray
                ems = self.eval_mean_samples
                budget = rays_o.shape[0] * (S if ems is None else min(ems, S))
            out = render_rays_grid_turbo(
                density_fn, color_fn, rays_o, rays_d, occ_slice,
                self.render_cfg, rng=rng, perturb=perturb,
                bg_color=bg_color if bg_color is not None else jnp.float32(1.0),
                max_samples=max_samples, budget=budget, return_geo=True,
            )
            geo_pack = out.pop("geo")
            out["deform"] = geo_pack[1]
            out["sample_mask"] = out.pop("compact_valid")
            return out
        m = march_rays(
            rays_o, rays_d, occ_slice, self.render_cfg, rng=rng, perturb=perturb
        )
        sigmas, geo_pack = density_fn(m["xyzs"])
        rgbs = color_fn(m["dirs"], geo_pack)
        out = composite_rays(
            sigmas, rgbs, m["ts"], m["deltas"], m["mask"], m["nears"], m["fars"],
            density_scale=self.render_cfg.density_scale,
            t_thresh=self.render_cfg.t_thresh,
        )
        if bg_color is None:
            bg_color = jnp.float32(1.0)
        out["image"] = out["image"] + (1.0 - out["weights_sum"])[..., None] * bg_color
        out["deform"] = geo_pack[1]
        out["sample_mask"] = m["mask"]
        return out

    # ---- train step (time-aware) ------------------------------------------

    def train_step(self, state, aux, batch, rng):
        images = batch["images"]
        poses = batch["poses"]
        intrinsics = batch["intrinsics"]
        times = batch["times"]
        idx = batch["idx"]
        F, H, W, C = images.shape
        n_rays = self.train_cfg.num_rays

        k_pix, k_bg, k_render = jax.random.split(rng, 3)
        image = images[idx]
        pose = poses[idx]
        time = times[idx]

        sample = sample_ray_indices(k_pix, H, W, n_rays)
        inds = sample["inds"]
        rays = rays_from_indices(pose, intrinsics, H, W, inds)
        pixels = image.reshape(H * W, C)[inds].astype(jnp.float32)
        if C == 4:
            bg_color = jax.random.uniform(k_bg, (n_rays, 3))
            gt_rgb = pixels[..., :3] * pixels[..., 3:] + bg_color * (1.0 - pixels[..., 3:])
        else:
            bg_color = jnp.float32(1.0)
            gt_rgb = pixels

        def loss_fn(params):
            out = self.render_batch(
                params, rays["rays_o"], rays["rays_d"],
                rng=k_render, perturb=True, bg_color=bg_color, aux=aux, time=time,
            )
            mse = jnp.mean((out["image"] - gt_rgb) ** 2)
            deform = out["deform"]
            dmask = out["sample_mask"][..., None]
            reg = jnp.sum(jnp.abs(deform) * dmask) / (jnp.sum(dmask) * 3 + 1e-6)
            return mse + self.deform_reg_weight * reg, mse

        (loss, mse), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = apply_gradients(state, grads, self.tx, ema_decay=self.ema_decay)
        return state, aux, {"loss": mse}

    # ---- occupancy maintenance (all slices, frozen after 100) -------------

    def _update_occupancy(self):
        occ: TimeOccupancyState = self.aux["occ"]
        if int(occ.iter_density) >= self.freeze_after:
            return  # frozen (dnerf/renderer.py:500)
        T = self.render_cfg.time_size
        # slices per dispatch: the reference loops all T slices on the
        # host (dnerf/renderer.py:463-550; 64 tunnel round trips); one
        # giant lax.map over T=64 slices FAULTS the v5e device (T<=32
        # compiles and runs — measured), so the refresh runs in <=16
        # slice chunks: T/16 dispatches, donated buffers, one final
        # mean/iter combine.
        C = min(getattr(self, "refresh_time_chunk", 16), T)
        while T % C:
            C -= 1
        if self._jit_update_occ is None:
            def upd_chunk(params, occ_state: TimeOccupancyState, rng, t0):
                half_t = 0.5 / T
                keys = jax.random.split(rng, C)
                times = (jnp.arange(C, dtype=jnp.float32) + t0 + 0.5) / T
                dg_c = jax.lax.dynamic_slice_in_dim(
                    occ_state.density_grid, t0, C, 0
                )
                og_c = jax.lax.dynamic_slice_in_dim(occ_state.occ_grid, t0, C, 0)

                def one(args):
                    dg, og, k, time = args
                    sl = OccupancyState(
                        density_grid=dg,
                        occ_grid=og,
                        mean_density=occ_state.mean_density,
                        iter_density=occ_state.iter_density,
                    )

                    def density_fn(x):
                        kk = jax.random.fold_in(k, 1)
                        tp = time + (jax.random.uniform(kk, ()) * 2 - 1) * half_t
                        sigma, _, _ = self.model.apply(
                            params, x, tp, method=type(self.model).density
                        )
                        return sigma, None

                    sl = update_occupancy(
                        sl, density_fn, self.render_cfg, k,
                        density_scale=self.render_cfg.density_scale,
                    )
                    # update_occupancy always re-packs the turbo
                    # payloads for its slice; stack them per time slice
                    # when the turbo march is active
                    if self.render_cfg.turbo:
                        return (sl.density_grid, sl.occ_grid,
                                sl.mean_density, sl.coarse_payload,
                                sl.fine_payload)
                    return sl.density_grid, sl.occ_grid, sl.mean_density

                outs = jax.lax.map(one, (dg_c, og_c, keys, times))

                def put(full, chunk):
                    return jax.lax.dynamic_update_slice_in_dim(
                        full, chunk, t0, 0
                    )

                new = occ_state.replace(
                    density_grid=put(occ_state.density_grid, outs[0]),
                    occ_grid=put(occ_state.occ_grid, outs[1]),
                )
                if self.render_cfg.turbo:
                    new = new.replace(
                        coarse_payload=put(occ_state.coarse_payload, outs[3]),
                        fine_payload=put(occ_state.fine_payload, outs[4]),
                    )
                return new, jnp.mean(outs[2])

            def finalize(occ_state: TimeOccupancyState, means):
                return occ_state.replace(
                    mean_density=jnp.mean(means),
                    iter_density=occ_state.iter_density + 1,
                )

            self._jit_update_occ = jax.jit(
                upd_chunk, static_argnums=(3,), donate_argnums=(1,)
            )
            self._jit_finalize_occ = jax.jit(finalize, donate_argnums=(0,))

        means = []
        cur = occ
        for t0 in range(0, T, C):
            self.rng, k = jax.random.split(self.rng)
            cur, m = self._jit_update_occ(self.state.params, cur, k, t0)
            means.append(m)
        cur = self._jit_finalize_occ(cur, jnp.stack(means))
        self.aux = dict(self.aux)
        self.aux["occ"] = cur

    def train_on_dataset(self, train_ds, valid_ds=None, max_epochs: int = 1):
        # skip the static-NeRF mark_untrained (per-slice culling is the
        # grid update's job for dynamic scenes)
        self.ensure_initialized()
        from ngp_tpu.training.nerf import NeRFTrainer

        NeRFTrainer.train_on_dataset(self, train_ds, valid_ds, max_epochs)

    def make_loader(self, dataset):
        images = jnp.asarray(dataset.images)
        poses = jnp.asarray(dataset.poses)
        intrinsics = jnp.asarray(dataset.intrinsics)
        times = jnp.asarray(dataset.times)
        np_rng = np.random.default_rng(self.train_cfg.seed)

        def epoch_iter():
            for idx in dataset.epoch_indices(np_rng, self.train_cfg.rand_pose):
                yield {
                    "images": images,
                    "poses": poses,
                    "intrinsics": intrinsics,
                    "times": times,
                    "idx": jnp.int32(idx),
                }

        return epoch_iter

    # ---- eval -------------------------------------------------------------

    def render_frame(self, pose, intrinsics, H, W, chunk=2**14, params=None, time=0.0):
        self.ensure_initialized()
        params = params if params is not None else self.eval_params()
        from ngp_tpu.data.raysampler import full_frame_rays_np

        rays = full_frame_rays_np(pose, intrinsics, H, W)
        ro, rd = rays["rays_o"], rays["rays_d"]
        n = H * W
        pad = (-n) % chunk
        if pad:
            ro = np.concatenate([ro, np.tile(ro[-1:], (pad, 1))])
            rd = np.concatenate([rd, np.tile(rd[-1:], (pad, 1))])
        # keyed by chunk + the eval dials render_batch reads at trace
        # time (same staleness rule as NeRFTrainer._chunk_renderer)
        key = ("dnerf", chunk) + self._eval_dial_key()
        if key not in self._jit_render_chunks:
            @jax.jit
            def render_frame_fn(params, aux, ro_chunks, rd_chunks, time):
                def one(args):
                    ro, rd = args
                    out = self.render_batch(
                        params, ro, rd, bg_color=jnp.float32(1.0), aux=aux, time=time
                    )
                    return out["image"], out["depth"]

                return jax.lax.map(one, (ro_chunks, rd_chunks))

            self._jit_render_chunks[key] = render_frame_fn
        img, dep = self._jit_render_chunks[key](
            params, self.aux, jnp.asarray(ro.reshape(-1, chunk, 3)),
            jnp.asarray(rd.reshape(-1, chunk, 3)), jnp.float32(time),
        )
        image = np.asarray(img).reshape(-1, 3)[:n].reshape(H, W, 3)
        depth = np.asarray(dep).reshape(-1)[:n].reshape(H, W)
        return image, depth

    def evaluate(self, dataset, max_frames=None):
        from ngp_tpu.training.metrics import PSNRMeter

        meter = PSNRMeter()
        n = len(dataset) if max_frames is None else min(max_frames, len(dataset))
        for i in range(n):
            img, _ = self.render_frame(
                dataset.poses[i], dataset.intrinsics, dataset.H, dataset.W,
                time=float(dataset.times[i]),
            )
            gt = dataset.images[i]
            if gt.shape[-1] == 4:
                gt = gt[..., :3] * gt[..., 3:] + 1.0 * (1 - gt[..., 3:])
            meter.update(img, gt)
        self.log(f"evaluate: {meter.report()} over {n} frames")
        return {"psnr": meter.measure()}

"""CCNeRF workload trainer: rank-residual training.

TPU-native equivalent of CCNeRF training through ``tensoRF/utils.py``:
the forward yields per-rank-group cumulative outputs [K, ...]; each K
is composited into its own image (the reference's run_cuda composites
per-K, nerf/renderer.py:298-311) and the loss averages the K MSEs
(nerf/utils.py:529-531) so that every rank prefix remains a usable
model. Compositing over K is a vmap over the shared march samples.
"""

from __future__ import annotations



import jax
import jax.numpy as jnp

from ngp_tpu.data.raysampler import rays_from_indices, sample_ray_indices
from ngp_tpu.models.ccnerf import CCNeRF
from ngp_tpu.models.occupancy import (
    composite_rays,
    march_rays,
    render_rays_grid_turbo_multi,
)
from ngp_tpu.training.nerf_grid import GridNeRFTrainer
from ngp_tpu.training.state import TrainState, apply_gradients, create_train_state


class CCNeRFTrainer(GridNeRFTrainer):
    def __init__(self, model: CCNeRF, render_cfg, train_cfg, name="ccnerf", **kwargs):
        super().__init__(model, render_cfg, train_cfg, name=name, **kwargs)

    def init_state(self, rng) -> TrainState:
        from ngp_tpu.models.ccnerf import init_ccnerf

        params = init_ccnerf(rng, self.model.cfg)
        return create_train_state(params, self.tx, use_ema=self.ema_decay is not None)

    def _fns(self, params):
        model = self.model

        def density_fn(x):
            return model.density(params, x)

        def color_fn(d, geo):
            shape = d.shape[:-1]
            _, rgb = model.sigma_rgb(
                params, geo.reshape(-1, 3), d.reshape(-1, 3), K=-1, residual=False
            )
            return rgb.reshape(*shape, 3)

        return density_fn, color_fn, None

    # residual training step: per-K composite + averaged loss
    def train_step(self, state, aux, batch, rng):
        images = batch["images"]
        poses = batch["poses"]
        intrinsics = batch["intrinsics"]
        idx = batch["idx"]
        F, H, W, C = images.shape
        n_rays = self.train_cfg.num_rays

        k_pix, k_bg, k_render = jax.random.split(rng, 3)
        image = images[idx]
        pose = poses[idx]
        sample = sample_ray_indices(k_pix, H, W, n_rays)
        rays = rays_from_indices(pose, intrinsics, H, W, sample["inds"])
        pixels = image.reshape(H * W, C)[sample["inds"]].astype(jnp.float32)
        if C == 4:
            bg_color = jax.random.uniform(k_bg, (n_rays, 3))
            gt = pixels[..., :3] * pixels[..., 3:] + bg_color * (1 - pixels[..., 3:])
        else:
            bg_color = jnp.float32(1.0)
            gt = pixels

        occ = aux["occ"]
        cfg = self.render_cfg
        model = self.model

        def loss_fn(params):
            if cfg.turbo:
                # flagship matmul march: one march/compaction shared by
                # every rank prefix, per-K placement + composite
                def sigma_rgb_fn(pts, dirs):
                    sig, rgb = model.sigma_rgb(
                        params, pts, dirs, residual=True
                    )
                    K = sig.shape[0]
                    M = pts.shape[0]
                    return sig.reshape(K, M), rgb.reshape(K, M, 3)

                out = render_rays_grid_turbo_multi(
                    sigma_rgb_fn, rays["rays_o"], rays["rays_d"], occ, cfg,
                    rng=k_render, perturb=True, bg_color=bg_color,
                )
                per_k = jnp.mean(
                    (out["image"] - gt[None]) ** 2, axis=(1, 2)
                )
                return per_k.mean()
            m = march_rays(
                rays["rays_o"], rays["rays_d"], occ, cfg, rng=k_render, perturb=True
            )
            S = m["xyzs"].shape[1]
            flat_x = m["xyzs"].reshape(-1, 3)
            flat_d = m["dirs"].reshape(-1, 3)
            sigma, rgb = model.sigma_rgb(params, flat_x, flat_d, residual=True)
            K = sigma.shape[0]
            sigma = sigma.reshape(K, n_rays, S)
            rgb = rgb.reshape(K, n_rays, S, 3)

            def comp(sig_k, rgb_k):
                out = composite_rays(
                    sig_k, rgb_k, m["ts"], m["deltas"], m["mask"],
                    m["nears"], m["fars"],
                    density_scale=cfg.density_scale, t_thresh=cfg.t_thresh,
                )
                return out["image"] + (1 - out["weights_sum"])[..., None] * bg_color

            imgs = jax.vmap(comp)(sigma, rgb)  # [K, N, 3]
            per_k = jnp.mean((imgs - gt[None]) ** 2, axis=(1, 2))
            return per_k.mean()

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        state = apply_gradients(state, grads, self.tx, ema_decay=self.ema_decay)
        return state, aux, {"loss": loss}

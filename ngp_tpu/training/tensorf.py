"""TensoRF workload trainer.

TPU-native equivalent of ``tensoRF/utils.py``: grid-accelerated
training with (a) L1 sparsity regularisation on the sigma factors
(utils.py:46), (b) two learning-rate groups — factors at lr0, MLPs at
lr1 (main_tensoRF.py:24-25, network.py:321-330), (c) progressive
upsampling at fixed steps with log-spaced resolutions and optimizer
reset (utils.py:112-129, main_tensoRF.py:131-134), (d) occupancy-driven
model shrink at the first upsample (utils.py:115-116).

On TPU a resolution change is a param-shape change → the step re-jits
(a handful of recompiles per run, exactly as many as the reference's
optimizer resets); EMA shadows are transformed with the same resize so
they stay aligned.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ngp_tpu.config import RenderConfig, TrainConfig

from ngp_tpu.models.tensorf import (
    TensoRFCPNetwork,
    TensoRFNetwork,
    shrink_vm_params,
    upsample_cp_params,
    upsample_vm_params,
    _vm_resolution,
)
from ngp_tpu.training.nerf_grid import GridNeRFTrainer
from ngp_tpu.training.state import create_train_state


def upsample_schedule(
    resolution0: int, resolution1: int, steps: Sequence[int]
) -> Sequence[int]:
    """Log-spaced target resolutions (main_tensoRF.py:132)."""
    return (
        np.round(
            np.exp(np.linspace(np.log(resolution0), np.log(resolution1), len(steps) + 1))
        )
        .astype(np.int32)
        .tolist()[1:]
    )


class TensoRFTrainer(GridNeRFTrainer):
    def __init__(
        self,
        model,
        render_cfg: RenderConfig,
        train_cfg: TrainConfig,
        lr_net: float = 1e-3,
        l1_reg_weight: float = 1e-4,
        upsample_model_steps: Sequence[int] = (2000, 3000, 4000, 5500, 7000),
        resolution0: int = 128,
        resolution1: int = 300,
        name: str = "tensoRF",
        **kwargs,
    ):
        self.lr_net = lr_net  # needed by make_optimizer (called in super init)
        super().__init__(model, render_cfg, train_cfg, name=name, **kwargs)
        self.l1_reg_weight = l1_reg_weight
        self.upsample_model_steps = list(upsample_model_steps)
        self.upsample_resolutions = upsample_schedule(
            resolution0, resolution1, upsample_model_steps
        )
        self.is_cp = isinstance(model, TensoRFCPNetwork)
        self.aabb = np.asarray(render_cfg.aabb, np.float32)
        self._did_shrink = False

    # ---- optimizer: factor group at lr, net group at lr_net --------------

    def make_optimizer(self):
        net_schedule = optax.exponential_decay(
            init_value=self.lr_net,
            transition_steps=self.max_steps,
            decay_rate=0.1,
            end_value=self.lr_net * 0.1,
        )

        def label_fn(params):
            def label(path, _):
                name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
                # factor params sit directly in the 'params' dict with
                # sigma_/color_/bg_ prefixes; everything else is a net
                top = path[1].key if len(path) > 1 and hasattr(path[1], "key") else ""
                if top.startswith(("sigma_", "color_vec", "color_mat", "bg_mat")):
                    return "factors"
                return "nets"

            return jax.tree_util.tree_map_with_path(label, params)

        return optax.multi_transform(
            {
                "factors": optax.adam(self.schedule, b1=0.9, b2=0.99, eps=1e-15),
                "nets": optax.adam(net_schedule, b1=0.9, b2=0.99, eps=1e-15),
            },
            label_fn,
        )

    # ---- rendering with aabb closure -------------------------------------

    def _fns(self, params):
        aabb = jnp.asarray(self.aabb)
        model = self.model

        def density_fn(x):
            return model.apply(params, x, aabb, method=type(model).density)

        def color_fn(d, geo):
            return model.apply(params, d, geo, aabb, method=type(model).color)

        bg_fn = None
        if getattr(model, "bg_radius", -1) > 0:
            def bg_fn(sph, d):
                return model.apply(params, sph, d, method=type(model).background)

        return density_fn, color_fn, bg_fn

    def init_state(self, rng):
        x0 = jnp.zeros((8, 3))
        d0 = jnp.concatenate([jnp.ones((8, 1)), jnp.zeros((8, 2))], axis=-1)
        params = self.model.init(
            rng, x0, d0, jnp.asarray(self.aabb), method=type(self.model).full_init
        )
        return create_train_state(params, self.tx, use_ema=self.ema_decay is not None)

    # ---- loss: add L1 factor regularisation ------------------------------

    def _loss_extra(self, params):
        """L1 sparsity on sigma factors, added to the MSE loss exactly
        as the reference (tensoRF/utils.py:46)."""
        l1 = self.model.apply(params, method=type(self.model).density_loss)
        return self.l1_reg_weight * l1

    # ---- upsample / shrink hooks -----------------------------------------

    def on_step_begin(self):
        super().on_step_begin()
        if self.global_step in self.upsample_model_steps:
            i = self.upsample_model_steps.index(self.global_step)
            reso = int(self.upsample_resolutions[i])
            if not self._did_shrink:
                self._shrink()
                self._did_shrink = True
            self._upsample((reso, reso, reso))

    def _shrink(self):
        occ = self.aux["occ"]
        params, new_aabb = shrink_vm_params(
            jax.device_get(self.state.params),
            self.aabb,
            np.asarray(occ.density_grid),
            float(occ.mean_density),
            self.render_cfg.density_thresh,
            self.render_cfg.bound,
            self.render_cfg.grid_size,
        ) if not self.is_cp else (jax.device_get(self.state.params), self.aabb)
        self.aabb = np.asarray(new_aabb, np.float32)
        self._replace_params(params)
        self.log(f"shrink: aabb -> {self.aabb.tolist()}")

    def _upsample(self, resolution: Tuple[int, int, int]):
        fn = upsample_cp_params if self.is_cp else upsample_vm_params
        params = fn(jax.device_get(self.state.params), resolution)
        self._replace_params(params)
        self.log(f"upsample -> {resolution}")

    def _replace_params(self, params):
        """Swap params (new shapes): clone the module with the new
        resolution (flax validates param shapes against it), reset
        optimizer state, resize EMA, invalidate jitted functions."""
        if self.is_cp:
            p = params["params"]
            from ngp_tpu.models.tensorf import VEC_IDS

            res = [0, 0, 0]
            for i in range(3):
                res[VEC_IDS[i]] = p[f"sigma_vec_{i}"].shape[1]
            self.model = self.model.clone(resolution=tuple(res))
        else:
            self.model = self.model.clone(resolution=_vm_resolution(params))
        ema = None
        if self.state.ema_params is not None:
            # EMA shadows get the same geometric transform by re-running
            # the resize on them; after a shape change the safest shadow
            # is a fresh copy of the new params (reference torch_ema
            # would be equally reset by the new Parameter objects)
            ema = jax.tree.map(lambda x: x + 0, params)
        self.state = self.state.replace(
            params=jax.device_put(params),
            opt_state=self.tx.init(params),
            ema_params=ema,
        )
        self._jit_train_step = None
        self._jit_render_chunk = None
        self._jit_render_chunks = {}
        self._jit_update_occ = None
        self.ensure_initialized()

    # ---- checkpoint resolution handling (tensoRF/utils.py:247, :350) -----

    def _extra_ckpt_metadata(self) -> dict:
        return {
            "resolution": [int(r) for r in self.current_resolution],
            "aabb": [float(v) for v in self.aabb],
        }

    def load_checkpoint(self, path=None) -> bool:
        """Peek the stored resolution and resize the live model BEFORE
        restoring, so factor shapes match (the reference re-upsamples
        the model prior to load, tensoRF/utils.py:350)."""
        import json
        import os

        from ngp_tpu.training import checkpoints as ckpt_lib

        self.ensure_initialized()
        if path is None:
            path = ckpt_lib.latest_checkpoint(self.workspace, self.name)
        if path is None or not os.path.exists(path):
            self.log("no checkpoint found, training from scratch")
            return False
        meta_path = path + ".json"
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                extras = json.load(f)
            reso = extras.get("resolution")
            if reso and tuple(reso) != self.current_resolution:
                self._upsample(tuple(int(r) for r in reso))
                self.log(f"resized model to checkpointed resolution {reso}")
            if extras.get("aabb"):
                self.aabb = np.asarray(extras["aabb"], np.float32)
        return super().load_checkpoint(path)

    @property
    def current_resolution(self):
        if self.is_cp:
            p = self.state.params["params"]
            return tuple(
                p[f"sigma_vec_{i}"].shape[1] for i in range(3)
            )
        return _vm_resolution(self.state.params)

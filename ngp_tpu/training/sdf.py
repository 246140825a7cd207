"""SDF workload trainer.

TPU-native equivalent of the reference's ``sdf/utils.py`` Trainer
(simplest end-to-end slice, SURVEY.md §3.5): direct SDF regression with
MAPE loss, mesh export via chunked grid query + marching cubes
(sdf/utils.py:217-259).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ngp_tpu.data.mesh import save_mesh
from ngp_tpu.models.sdf import SDFNetwork
from ngp_tpu.native import marching_cubes
from ngp_tpu.ops.losses import mape_loss
from ngp_tpu.training.state import TrainState, apply_gradients, create_train_state
from ngp_tpu.training.trainer import Trainer


class SDFTrainer(Trainer):
    def __init__(self, model: SDFNetwork, name: str = "ngp_sdf", **kwargs):
        super().__init__(name=name, **kwargs)
        self.model = model

    def init_state(self, rng) -> TrainState:
        params = self.model.init(rng, jnp.zeros((8, 3)))
        return create_train_state(params, self.tx, use_ema=self.ema_decay is not None)

    def train_step(self, state, aux, batch, rng):
        points = batch["points"]
        sdfs = batch["sdfs"]

        def loss_fn(params):
            pred = self.model.apply(params, points)
            return mape_loss(pred, sdfs)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        state = apply_gradients(state, grads, self.tx, ema_decay=self.ema_decay)
        return state, aux, {"loss": loss}

    def eval_step(self, state, aux, batch):
        pred = self.model.apply(state.params, batch["points"])
        return {"loss": mape_loss(pred, batch["sdfs"])}

    def predict_sdf(self, points: np.ndarray, chunk: int = 2**18) -> np.ndarray:
        """Chunked SDF query at arbitrary points (uses EMA weights if on)."""
        self.ensure_initialized()
        params = (
            self.state.ema_params if self.state.ema_params is not None else self.state.params
        )
        apply = jax.jit(lambda p, x: self.model.apply(p, x))
        outs = []
        n = len(points)
        pad = (-n) % chunk
        pts = np.concatenate([points, np.zeros((pad, 3), np.float32)]) if pad else points
        for i in range(0, len(pts), chunk):
            outs.append(np.asarray(apply(params, jnp.asarray(pts[i : i + chunk]))))
        return np.concatenate(outs)[:n, 0]

    def save_mesh(self, path: Optional[str] = None, resolution: int = 256):
        """1024^3-style chunked grid eval + marching cubes
        (sdf/utils.py:235-259; resolution default lowered for memory)."""
        if path is None:
            path = os.path.join(self.workspace, "meshes", f"{self.name}_{self.epoch}.obj")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        xs = np.linspace(-1, 1, resolution, dtype=np.float32)
        grid = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), axis=-1).reshape(-1, 3)
        sdf = self.predict_sdf(grid).reshape(resolution, resolution, resolution)
        # marching expects "inside" to be > iso; sdf is positive outside
        verts, faces = marching_cubes(-sdf, 0.0)
        verts = verts / (resolution - 1) * 2.0 - 1.0
        save_mesh(path, verts, faces)
        self.log(f"saved mesh to {path} ({len(verts)} verts, {len(faces)} faces)")
        return path

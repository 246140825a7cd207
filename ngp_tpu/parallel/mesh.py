"""Mesh + sharding helpers.

Parallelism design (SURVEY.md §2.3): the reference is DP-only (DDP
wrap + eval collectives); rays are embarrassingly parallel and the
model is MB-scale, so DP over rays is the primary axis here too, with
XLA inserting the gradient psum over ICI. For scaling the MODEL
dimension (larger CP ranks / wider MLPs than one chip's VMEM likes),
``make_mesh(model_parallel=k)`` builds a ('data', 'model') mesh and
``tp_param_specs`` shards the CP factor banks along their rank axis —
megatron-style tensor parallelism where the SPMD partitioner places
the all-gather of the (tiny) per-device feature slices before the MLP
and the reduce-scatter of factor grads, all over ICI.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_devices: Optional[int] = None,
    axis_name: str = DATA_AXIS,
    model_parallel: int = 1,
) -> Mesh:
    """Device mesh: 1-D over rays, or 2-D ('data', 'model') when
    model_parallel > 1 (the 'model' axis shards CP factor ranks /
    MLP hidden units; keep it inside an ICI domain)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if model_parallel > 1:
        assert len(devices) % model_parallel == 0
        grid = np.array(devices).reshape(-1, model_parallel)
        return Mesh(grid, (axis_name, MODEL_AXIS))
    return Mesh(np.array(devices), (axis_name,))


def tp_param_specs(params, mesh: Mesh):
    """NamedSharding pytree for tensor-parallel params: CP factor banks
    [3, res, R] shard their RANK axis over 'model'; every other leaf is
    replicated. With rank-R features this is the megatron split of the
    dominant parameter block; XLA inserts the feature all-gather before
    the MLP and the grad reduce-scatter automatically."""

    def spec(path, leaf):
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        if "factors_" in name and leaf.ndim == 3:
            return NamedSharding(mesh, P(None, None, MODEL_AXIS))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec, params)


def data_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (ray) dimension across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_pytree(tree, sharding: NamedSharding):
    """Place every leaf of a pytree with the given sharding."""
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)

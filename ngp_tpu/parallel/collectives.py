"""Eval-time collective aggregation over the data-parallel mesh.

TPU-native equivalent of the reference's eval-loop collectives
(nerf/utils.py:944-965): ``dist.all_reduce(loss, SUM)`` +
``dist.all_gather`` of preds/truths with rank-0 metric updates. Under
SPMD there are no ranks — a ``shard_map`` over the ray axis with
``psum`` / ``all_gather`` reproduces the same math with XLA inserting
the ICI collectives.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ngp_tpu.parallel.mesh import DATA_AXIS


def eval_metrics_dp(
    mesh: Mesh,
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    axis_name: str = DATA_AXIS,
) -> Dict[str, jnp.ndarray]:
    """All-reduce eval metrics over rays sharded across the mesh.

    pred/gt: [N, C] with N divisible by the mesh size. Each device
    computes its local squared-error sum; a ``psum`` produces the
    global MSE/PSNR (the reference's ``all_reduce(loss, SUM)/world_size``,
    nerf/utils.py:944-951). Returns {"mse", "psnr"} replicated scalars.
    """
    def local(p, g):
        se = jnp.sum((p.astype(jnp.float32) - g.astype(jnp.float32)) ** 2)
        n = jnp.float32(p.size)
        se = jax.lax.psum(se, axis_name)
        n = jax.lax.psum(n, axis_name)
        mse = se / n
        return {"mse": mse, "psnr": -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))}

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis_name), P(axis_name)),
        out_specs=P(),
    )
    return fn(pred, gt)


def gather_predictions_dp(
    mesh: Mesh, pred_local_batches: jnp.ndarray, axis_name: str = DATA_AXIS
) -> jnp.ndarray:
    """All-gather per-device prediction shards into the full array on
    every device (the reference's ``dist.all_gather`` of preds,
    nerf/utils.py:952-965). Input [N, ...] sharded on axis 0; output
    [N, ...] fully replicated.
    """
    def local(x):
        return jax.lax.all_gather(x, axis_name, axis=0, tiled=True)

    fn = jax.shard_map(
        local, mesh=mesh, in_specs=(P(axis_name),), out_specs=P(),
        check_vma=False,  # all_gather output IS replicated
    )
    return fn(pred_local_batches)

"""Multi-chip parallelism: mesh construction + data-parallel sharding.

TPU-native replacement for the reference's (dormant) DDP plumbing
(SURVEY.md §2.3: SyncBatchNorm+DDP wrap at nerf/utils.py:363-367, eval
all_reduce/all_gather at :944-959). On TPU the natural first axis is
DP over rays: ray batches are embarrassingly parallel and the model
(hash table ~12 MB + MLPs) fits per-chip, so parameters are replicated
and XLA's SPMD partitioner inserts the gradient all-reduce over ICI
automatically when sharded-ray losses meet replicated params — the
explicit ``dist.all_reduce`` call sites disappear into the compiler.
"""

from ngp_tpu.parallel.collectives import eval_metrics_dp, gather_predictions_dp
from ngp_tpu.parallel.mesh import (
    data_sharding,
    make_mesh,
    replicate_sharding,
    shard_pytree,
)

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicate_sharding",
    "shard_pytree",
    "eval_metrics_dp",
    "gather_predictions_dp",
]

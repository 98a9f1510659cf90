"""Device-mesh helpers for data-parallel training over ICI.

The reference's only parallelism is DDP data-parallelism over NCCL
(multigpu.py:16-34, 69, 1109). TPU-native equivalent: a 1-D
``jax.sharding.Mesh`` over the chips; gradients are averaged with
``pmean`` inside a ``shard_map``-decorated train step, compiled by XLA to
ICI collectives (see SURVEY.md §2.2).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None,
              axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over ``n_devices`` (default: all)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis_name: str = DATA_AXIS):
    """Place a host batch with its leading axis sharded over the mesh."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def maybe_initialize_distributed(**kwargs) -> bool:
    """Initialize multi-host JAX (DCN) when running under a multi-process
    launcher; no-op single-host. The reference's MASTER_ADDR/NCCL process
    group (multigpu.py:16-34) maps to ``jax.distributed.initialize`` — XLA
    then routes collectives over ICI within a slice and DCN across hosts.
    """
    import os
    if int(os.environ.get("JAX_PROCESS_COUNT",
                          os.environ.get("SLURM_NTASKS", "1"))) <= 1:
        return False
    jax.distributed.initialize(**kwargs)
    return True


def shard_host_local_batch(mesh: Mesh, batch, axis_name: str = DATA_AXIS):
    """Multi-host data sharding: each process contributes its local shard
    of the global batch (the reference's per-rank sim-list chunking,
    multigpu.py:694-707, done with global arrays instead)."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        batch)

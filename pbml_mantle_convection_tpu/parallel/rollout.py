"""Batch-sharded multi-simulation rollouts over the device mesh.

The single-chip coupled rollout (sim/engine.py) advances a batch of
simulations with ONE shared CFL dt (SimState.dt is scalar — the batch is
coupled through the time step).  For multi-simulation production runs —
the reference launches independent GAIA processes per parameter set
(advect_wi_gaia.py argv grid, multigpu.py:694-759 rank-sharded sim
lists) — the TPU-native shape is one simulation per chip:

* the per-device body traces at local batch 1, so each chip runs the
  full Pallas megakernel executor (B=1-only) instead of the batched
  standard path — ~2.3× per-chip throughput at 256² (PERF.md round 3);
* each simulation advances with its OWN dt (matching a standalone B=1
  run bit-for-bit, unlike the coupled-dt in-batch semantics);
* no cross-chip collectives at all — embarrassingly parallel over ICI,
  aggregate throughput is per-chip steps/s × n_chips.

``shard_map`` (not jit auto-partitioning) is essential here: under jit
the body would trace at the GLOBAL batch shape and the B=1 megakernel
path would decline on every chip.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import DATA_AXIS


class ShardedRollout(NamedTuple):
    """Per-simulation results of a batch-sharded rollout.

    Field planes keep their (B, H, W) layout (leading axis sharded over
    the mesh); per-sim scalars are (B,) — each simulation has its own
    clock, unlike the scalar ``SimState.t/dt`` of the coupled batch.
    """

    T: jnp.ndarray        # (B, H, W)
    u: jnp.ndarray
    v: jnp.ndarray
    p: jnp.ndarray
    V: jnp.ndarray
    t: jnp.ndarray        # (B,) per-sim time
    dt: jnp.ndarray       # (B,) per-sim last dt
    mean_T: jnp.ndarray   # (n_steps, B) per-sim mean-T trace


def make_batch_sharded(engine, n_steps: int, mesh: Mesh,
                       axis_name: str = DATA_AXIS):
    """Build the jitted batch-sharded rollout callable ONCE.

    Returns ``f(T0) -> tuple`` (the raw ShardedRollout fields).  Bench
    harnesses must reuse this single jitted object across warm-up and
    timed invocations — re-entering :func:`rollout_batch_sharded` builds
    a fresh closure each call and would retrace/recompile inside the
    timed region.
    """
    Pb = P(axis_name)

    def body(T0_loc):
        bl = T0_loc.shape[0]
        if bl == 1:
            st = engine.init_state(T0_loc)
            st, tr = engine.multi_step(st, n_steps)
            return (st.T, st.u, st.v, st.p, st.V,
                    st.t[None], st.dt[None], tr.mean_T[:, None])
        # local batch > 1: per-sim scan (keeps independent dt semantics)
        def one(T0_i):
            st = engine.init_state(T0_i[None])
            st, tr = engine.multi_step(st, n_steps)
            return (st.T[0], st.u[0], st.v[0], st.p[0], st.V[0],
                    st.t, st.dt, tr.mean_T)
        T, u, v, p, V, t, dt, mT = jax.lax.map(one, T0_loc)
        return T, u, v, p, V, t, dt, jnp.transpose(mT)

    out_specs = (Pb, Pb, Pb, Pb, Pb, Pb, Pb, P(None, axis_name))
    # check_vma=False: engines whose surrogate emits mesh-unvarying
    # closure constants (e.g. analytic test velocities) would otherwise
    # trip the varying-manual-axes carry check inside the scan
    f = shard_map(body, mesh=mesh, in_specs=(Pb,), out_specs=out_specs,
                  check_vma=False)
    # tpu_jit: the per-chip body runs the megakernel executor, whose
    # scoped-VMEM stack needs the raised limit (utils/jit.py)
    from ..utils.jit import tpu_jit
    return tpu_jit(f)


def rollout_batch_sharded(engine, T0, n_steps: int, mesh: Mesh,
                          axis_name: str = DATA_AXIS) -> ShardedRollout:
    """Advance ``B`` independent simulations, one (or B/n_devices) per
    device.  ``T0``: (B, H, W) with B divisible by the mesh size.

    Each device runs ``engine.init_state`` + ``engine.multi_step`` on
    its local slice; with B == n_devices the local batch is 1 and the
    rollout takes the megakernel fast path per chip.
    """
    B = T0.shape[0]
    n_dev = mesh.devices.size
    if B % n_dev:
        raise ValueError(f"batch {B} not divisible by mesh size {n_dev}")
    f = make_batch_sharded(engine, n_steps, mesh, axis_name)
    T, u, v, p, V, t, dt, mT = f(T0)
    return ShardedRollout(T=T, u=u, v=v, p=p, V=V, t=t, dt=dt, mean_T=mT)

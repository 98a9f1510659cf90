"""Multi-device rollouts: a batch of simulations sharded over the mesh.

The engine's state is batched (B, H, W); placing it with a batch-axis
NamedSharding lets jit auto-partition the whole coupled scan across
devices — linear multi-sim throughput with zero code changes (parameter
sweeps are the reference's primary workload: 130 sims).
"""

import numpy as np
import jax
import jax.numpy as jnp

from pbml_mantle_convection_tpu.constants import SimParams
from pbml_mantle_convection_tpu.parallel.mesh import (
    batch_sharding, make_mesh)
from pbml_mantle_convection_tpu.sim.engine import SimEngine
from pbml_mantle_convection_tpu.sim.grid import Grid
from pbml_mantle_convection_tpu.sim.stepper import TimeStepper


def _engine():
    grid = Grid(H=20, W=28)
    params = SimParams(raq=3.0, fkt=1e6, fkp=3.0)
    xc, yc = grid.xc, grid.yc
    u = jnp.pi * jnp.cos(jnp.pi * yc) * jnp.sin(jnp.pi * xc / grid.aspect)
    v = -(jnp.pi / grid.aspect) * jnp.sin(jnp.pi * yc) * jnp.cos(
        jnp.pi * xc / grid.aspect)

    def apply_fn(x):
        b = x.shape[0]
        return (jnp.broadcast_to(u, (b,) + u.shape),
                jnp.broadcast_to(v, (b,) + v.shape), None)

    stepper = TimeStepper(grid=grid, params=params, apply_fn=apply_fn,
                          dtype=jnp.float64)
    return SimEngine(grid=grid, params=params, stepper=stepper,
                     dtype=jnp.float64)


def test_batch_sharded_rollout_matches_single_device():
    eng = _engine()
    mesh = make_mesh(8)
    B = 8
    rng = np.random.default_rng(0)
    T0 = jnp.clip(
        1.0 - eng.grid.yc[None]
        + 0.1 * jnp.asarray(rng.normal(size=(B, eng.grid.H, eng.grid.W))),
        0, 1)
    state = eng.init_state(T0)

    multi = jax.jit(eng.multi_step, static_argnums=1)
    ref_state, ref_trace = multi(state, 25)

    # shard the batch axis over the 8 CPU devices and re-run
    sh = batch_sharding(mesh)
    sharded = state._replace(
        T=jax.device_put(state.T, sh), u=jax.device_put(state.u, sh),
        v=jax.device_put(state.v, sh), p=jax.device_put(state.p, sh),
        V=jax.device_put(state.V, sh))
    out_state, out_trace = multi(sharded, 25)

    np.testing.assert_allclose(np.asarray(out_state.T),
                               np.asarray(ref_state.T), rtol=1e-12)
    # the field really is distributed
    assert len(out_state.T.sharding.device_set) == 8

def test_shard_map_rollout_matches_per_sim_runs():
    """rollout_batch_sharded (one sim per device, shard_map) equals B
    independent single-sim rollouts — per-sim dt, unlike the coupled-dt
    batched engine semantics."""
    from pbml_mantle_convection_tpu.parallel.rollout import (
        rollout_batch_sharded)
    eng = _engine()
    mesh = make_mesh(8)
    B = 8
    rng = np.random.default_rng(1)
    T0 = jnp.clip(
        1.0 - eng.grid.yc[None]
        + 0.1 * jnp.asarray(rng.normal(size=(B, eng.grid.H, eng.grid.W))),
        0, 1)

    out = rollout_batch_sharded(eng, T0, 10, mesh)
    assert out.T.shape == (B, eng.grid.H, eng.grid.W)
    assert out.t.shape == (B,)
    assert out.mean_T.shape == (10, B)
    assert len(out.T.sharding.device_set) == 8

    multi = jax.jit(eng.multi_step, static_argnums=1)
    for b in [0, 3, 7]:
        st_b, tr_b = multi(eng.init_state(T0[b][None]), 10)
        np.testing.assert_allclose(np.asarray(out.T[b]),
                                   np.asarray(st_b.T[0]), rtol=1e-12)
        np.testing.assert_allclose(float(out.t[b]), float(st_b.t),
                                   rtol=1e-12)
        np.testing.assert_allclose(np.asarray(out.mean_T[:, b]),
                                   np.asarray(tr_b.mean_T), rtol=1e-12)


def test_shard_map_rollout_local_batch_gt1():
    """B = 2×mesh: two sims per device via the in-body lax.map — still
    per-sim dt semantics."""
    from pbml_mantle_convection_tpu.parallel.rollout import (
        rollout_batch_sharded)
    eng = _engine()
    mesh = make_mesh(4)
    B = 8
    rng = np.random.default_rng(2)
    T0 = jnp.clip(
        1.0 - eng.grid.yc[None]
        + 0.1 * jnp.asarray(rng.normal(size=(B, eng.grid.H, eng.grid.W))),
        0, 1)
    out = rollout_batch_sharded(eng, T0, 6, mesh)
    multi = jax.jit(eng.multi_step, static_argnums=1)
    for b in [0, 5]:
        st_b, _ = multi(eng.init_state(T0[b][None]), 6)
        np.testing.assert_allclose(np.asarray(out.T[b]),
                                   np.asarray(st_b.T[0]), rtol=1e-12)


def test_make_batch_sharded_callable_is_reusable():
    """make_batch_sharded returns ONE jitted callable the bench harness
    reuses across warm-up and timed T0s (no retrace between calls) —
    and its results match the one-shot rollout_batch_sharded wrapper."""
    from pbml_mantle_convection_tpu.parallel.rollout import (
        make_batch_sharded, rollout_batch_sharded)
    eng = _engine()
    mesh = make_mesh(8)
    B = 8
    rng = np.random.default_rng(3)
    mk = lambda: jnp.clip(
        1.0 - eng.grid.yc[None]
        + 0.1 * jnp.asarray(rng.normal(size=(B, eng.grid.H, eng.grid.W))),
        0, 1)
    T0_warm, T0 = mk(), mk()

    f = make_batch_sharded(eng, 5, mesh)
    f(T0_warm)  # warm-up with different data (axon-dedupe-safe pattern)
    out = f(T0)
    n_traces = f._cache_size()
    assert n_traces == 1, f"callable retraced: {n_traces} cache entries"
    ref = rollout_batch_sharded(eng, T0, 5, mesh)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref.T),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(out[7]),
                               np.asarray(ref.mean_T), rtol=1e-12)

"""Coupled-rollout drivers: pure-JAX (fast path) and native-engine-coupled.

Framework equivalents of the reference's ``attempt()`` /
``attempt_unet()`` loops (advect_wi_gaia.py:538-833). Two execution
strategies:

* :func:`rollout_jax` — the TPU path: the whole coupled loop is
  ``SimEngine.rollout`` (one ``lax.scan`` per snapshot chunk), with the
  reference's periodic pickle snapshots written between chunks.
* :func:`rollout_native` — the verification path: drives the native C++
  engine (sim/gaia_native.py) step by step with surrogate velocities,
  reproducing the reference's per-step host exchange
  (advect_wi_gaia.py:583-677) including the ``intervene_TS``
  (MMSolverSkip) logic and warm-up steps.

Both record T_vec / t_vec / TS_vec and snapshot dictionaries in the
reference's pickle layout (advect_wi_gaia.py:654-668).
"""

from __future__ import annotations

import os
import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.checkpoint import save_pickle
from ..utils.jit import tpu_jit
from .engine import SimEngine
from .stepper import TimeStepper


def _dump(gaia_dir, mode, snapshots, TS_vec, t_vec, T_vec):
    save_pickle(os.path.join(gaia_dir, f"snapshots_{mode}.pkl"), snapshots)
    save_pickle(os.path.join(gaia_dir, f"TS_vec_{mode}.pkl"), TS_vec)
    save_pickle(os.path.join(gaia_dir, f"t_vec_{mode}.pkl"), t_vec)
    save_pickle(os.path.join(gaia_dir, f"T_vec_{mode}.pkl"), T_vec)


def rollout_jax(
    engine: SimEngine,
    T0,
    n_steps: int,
    gaia_dir: Optional[str] = None,
    mode: str = "ML_STOKES",
    snapshot_every: int = 200,
    timed_steps: int = 0,
):
    """Fully-on-device rollout with reference-format outputs.

    TS_vec per-step wall times (the reference records one per step,
    advect_wi_gaia.py:650-652): the first ``timed_steps`` steps are
    dispatched individually with a device sync, giving *true* per-step
    latencies (incl. the latency distribution the speedup studies plot);
    the remainder runs in ``snapshot_every``-sized scan chunks, each chunk
    wall-timed and amortized over its steps — so TS_vec is a genuine
    per-chunk distribution, not one global average. ``timed_steps=0``
    keeps full scan throughput.
    """
    state = engine.init_state(T0)
    jitted = tpu_jit(engine.multi_step, static_argnums=1)

    TS_vec: list = []
    traces = []
    snaps = []
    done = 0

    # compile every distinct chunk size outside the timed windows (AOT
    # lower+compile — does not advance the state), so no wall-clock
    # window amortizes compile time into TS_vec
    n_timed = min(timed_steps, n_steps)
    sizes = {1} if n_timed > 0 else set()
    d = n_timed
    while d < n_steps:
        k = min(snapshot_every or (n_steps - d), n_steps - d)
        sizes.add(k)
        d += k
    for k in sorted(sizes):
        jitted.lower(state, k).compile()
    for _ in range(n_timed):
        t0 = time.time()
        state, tr = jitted(state, 1)
        state.T.block_until_ready()
        TS_vec.append(time.time() - t0)
        traces.append(tr)
        done += 1
        if snapshot_every and done % snapshot_every == 0:
            snaps.append(jax.device_get(
                {"T": state.T, "u": state.u, "v": state.v,
                 "p": state.p, "V": state.V, "t": state.t}))

    # remainder: scan chunks, per-chunk wall amortization
    while done < n_steps:
        k = min(snapshot_every or (n_steps - done), n_steps - done)
        t0 = time.time()
        state, tr = jitted(state, k)
        state.T.block_until_ready()
        wall = time.time() - t0
        TS_vec.extend([wall / k] * k)
        traces.append(tr)
        done += k
        if snapshot_every:
            snaps.append(jax.device_get(
                {"T": state.T, "u": state.u, "v": state.v,
                 "p": state.p, "V": state.V, "t": state.t}))

    trace = jax.tree.map(lambda *xs: jnp.concatenate(xs), *traces)
    T_vec = list(np.asarray(trace.mean_T))
    t_vec = list(np.asarray(trace.t))

    snapshots = {"v": [], "P": [], "T": [],
                 "xcc": np.asarray(engine.grid.xc),
                 "ycc": np.asarray(engine.grid.yc)}
    for s in snaps:
        u = np.asarray(s["u"]).reshape(-1, 1)
        v = np.asarray(s["v"]).reshape(-1, 1)
        snapshots["v"].append(
            np.concatenate([u, v, np.zeros_like(u)], axis=1))
        snapshots["P"].append(np.asarray(s["p"]).reshape(-1))
        snapshots["T"].append(np.asarray(s["T"]).reshape(-1))

    if gaia_dir is not None:
        _dump(gaia_dir, mode, snapshots, TS_vec, t_vec, T_vec)
    return state, trace, snapshots


def rollout_native(
    sim,                       # gaia_native.Direct (already init2'd)
    stepper: Optional[TimeStepper],
    mode: str = "ML_STOKES",
    t_end: float = 10.0,
    intervene_ts: int = 1,
    warm_up_steps: int = 0,
    save_steps: int = 200,
    write_steps: int = 200,
    gaia_dir: Optional[str] = None,
    core_cool: bool = False,
    p_pred: bool = False,
    max_steps: Optional[int] = None,
):
    """The reference ``attempt()`` loop against the native engine
    (advect_wi_gaia.py:538-679). ``stepper`` supplies surrogate velocities
    for the ML modes; ``mode='GAIA'`` steps the native engine alone.
    """
    H, W = sim.shape
    state = sim.getState()
    save_every = t_end / save_steps
    write_every = t_end / write_steps

    T_vec = [float(np.copy(state["T"].mean()))]
    t_vec = [0.0]
    TS_vec = []
    snapshots = {"v": [], "P": [], "T": []}

    t = 0.0
    n_step = 0
    while n_step < warm_up_steps:
        n_step += 1
        sim.doTimestep()

    for var in ["v", "P", "T"]:
        snapshots[var].append(np.copy(state[var]))
    snapshots["xcc"] = np.copy(state["pos"][:, 0]).reshape(H, W)
    snapshots["ycc"] = np.copy(state["pos"][:, 1]).reshape(H, W)

    is_unet = stepper is not None and stepper.net in ("unet", "iunet")
    ml_step = None
    unet_step = None
    if is_unet:
        # the reference's attempt_unet: driver-level CFL dt, the network
        # advances T itself; GAIA only holds state (advect_wi_gaia.py:
        # 734-797)
        def _unet(T, u_prev, v_prev):
            dt = stepper.unet_dt(u_prev, v_prev)
            T_new, u, v, p, V = stepper.step_unet(T, u_prev, v_prev, dt)
            return T_new, dt, u, v, p, V
        unet_step = tpu_jit(_unet)
    elif stepper is not None:
        # jitted: T (1,H,W) -> (T_new, dt, u, v, p, V)
        ml_step = tpu_jit(lambda T: stepper.step(T))

    save_t = 0.0
    write_t = 0.0
    while t < t_end:
        if max_steps is not None and n_step >= warm_up_steps + max_steps:
            break
        n_step += 1
        t0 = time.time()

        if mode != "GAIA" and is_unet:
            s = float(stepper.scaler)
            Tp = jnp.asarray(state["T"], stepper.dtype).reshape(1, H, W)
            up = jnp.asarray(state["v"][:, 0], stepper.dtype
                             ).reshape(1, H, W) / s
            vp = jnp.asarray(state["v"][:, 1], stepper.dtype
                             ).reshape(1, H, W) / s
            T_new, dt, u, v, p, V = unet_step(Tp, up, vp)
            state["v"][:, 0] = np.asarray(u).reshape(-1)
            state["v"][:, 1] = np.asarray(v).reshape(-1)
            state["v"][:, 2] = 0.0
            state["V"][:] = np.asarray(V).reshape(-1)
            Tg = np.array(T_new).reshape(H, W)  # writable copy
            if not core_cool:
                Tg[0, :] = 1.0
            Tg[-1, :] = 0.0
            Tg[:, 0] = Tg[:, 1]
            Tg[:, -1] = Tg[:, -2]
            np.clip(Tg, 0.0, 2.0, out=Tg)
            state["T"][:] = Tg.reshape(-1)
            state["raw"].time = t
            dt = float(dt)
        elif mode != "GAIA":
            Tp = jnp.asarray(state["T"], stepper.dtype).reshape(1, H, W)
            T_new, dt_ml, u, v, p, V = ml_step(Tp)
            u = np.asarray(u)
            v = np.asarray(v)
            state["v"][:, 0] = u.reshape(-1)
            state["v"][:, 1] = v.reshape(-1)
            state["v"][:, 2] = 0.0
            if p_pred and p is not None:
                state["P"][:] = np.asarray(p).reshape(-1)
            state["V"][:] = np.asarray(V).reshape(-1)

            if mode != "ML" or n_step % intervene_ts == 0:
                # native energy step (the GAIA intervention)
                dt = sim.doTimestep()
                Tg = state["T"].reshape(H, W)
                if not core_cool:
                    Tg[0, :] = 1.0
                Tg[-1, :] = 0.0
                Tg[:, 0] = Tg[:, 1]
                Tg[:, -1] = Tg[:, -2]
                np.clip(Tg, 0.0, 2.0, out=Tg)
            else:
                # ML off-step: the explicit AD update from the stepper
                state["T"][:] = np.asarray(T_new).reshape(-1)
                dt = float(dt_ml)
            state["raw"].time = t
        else:
            dt = sim.doTimestep()

        t += float(dt)
        T_vec.append(float(np.copy(state["T"].mean())))
        t_vec.append(t)
        TS_vec.append(time.time() - t0)

        if t > save_t:
            save_t = t + save_every
            for var in ["v", "P", "T"]:
                snapshots[var].append(np.copy(state[var]))
        if gaia_dir is not None and t > write_t:
            write_t = t + write_every
            _dump(gaia_dir, mode, snapshots, TS_vec, t_vec, T_vec)

    if gaia_dir is not None:
        _dump(gaia_dir, mode, snapshots, TS_vec, t_vec, T_vec)
    return t, n_step, snapshots, T_vec, t_vec, TS_vec

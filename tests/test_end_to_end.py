"""End-to-end scientific validation on a coarse grid:

1. generate ground truth with the full-physics engine (PT Stokes +
   explicit energy stepping, mode="GAIA"),
2. train the flagship surrogate architecture on the trajectory,
3. run the coupled ML_STOKES rollout from the same initial state,
4. require the trained surrogate's temperature trajectory to beat the
   untrained one against ground truth.

This is the hermetic miniature of the reference's headline experiment
(train on GAIA data → advect_wi_gaia ML_STOKES vs GAIA comparison,
load_advection_results-checkpoint.ipynb).
"""

import numpy as np
import optax
import pytest
import jax
import jax.numpy as jnp

from pbml_mantle_convection_tpu.constants import SimParams
from pbml_mantle_convection_tpu.data import SnapshotDataset, SnapshotStore
from pbml_mantle_convection_tpu.models import NewFluidNet
from pbml_mantle_convection_tpu.physics.stokes import make_stokes_fn
from pbml_mantle_convection_tpu.sim.engine import SimEngine
from pbml_mantle_convection_tpu.sim.grid import Grid
from pbml_mantle_convection_tpu.sim.stepper import TimeStepper
from pbml_mantle_convection_tpu.train.train_step import (
    TrainStepConfig, make_train_step)
from pbml_mantle_convection_tpu.utils.evaluation import temperature_rmse

pytestmark = pytest.mark.slow

GRID = Grid(H=20, W=30, aspect=1.5)
PARAMS = SimParams(raq=6.0, fkt=1e3, fkp=2.0)
N_STEPS = 120


@pytest.fixture(scope="module")
def ground_truth():
    stepper = TimeStepper(grid=GRID, params=PARAMS,
                          apply_fn=lambda x: (None, None, None),
                          dtype=jnp.float64)
    eng = SimEngine(grid=GRID, params=PARAMS, stepper=stepper,
                    mode="GAIA",
                    stokes_fn=make_stokes_fn(GRID, raq=PARAMS.raq,
                                             n_iter=600),
                    dtype=jnp.float64)
    T0 = jnp.clip(1.0 - GRID.yc + 0.05 * jnp.sin(4 * GRID.xc)
                  * jnp.sin(np.pi * GRID.yc), 0, 1)[None]
    state = eng.init_state(T0)

    # record every 4th state as training data
    Ts, us, vs = [], [], []
    step = jax.jit(eng.step)
    states = [state]
    for i in range(N_STEPS):
        state = step(state)
        states.append(state)
        if i % 4 == 0:
            Ts.append(np.asarray(state.T[0]))
            us.append(np.asarray(state.u[0]))
            vs.append(np.asarray(state.v[0]))
    n = len(Ts)
    store = SnapshotStore(
        T=np.asarray(Ts), u=np.asarray(us), v=np.asarray(vs), p=None,
        paras=np.tile([PARAMS.raq, PARAMS.fkt, PARAMS.fkp], (n, 1)),
        step_index=np.arange(1, n + 1, dtype=np.float64),
        sim_id=np.zeros(n), times=np.asarray(
            [float(s.t) for s in states[1::4]][:n]),
        xc=np.asarray(GRID.xc), yc=np.asarray(GRID.yc))
    return T0, states, store


def _rollout_rmse(weights, model, T0, ref_states):
    stepper = TimeStepper(
        grid=GRID, params=PARAMS,
        apply_fn=lambda x: model.apply(weights, x), dtype=jnp.float64)
    eng = SimEngine(grid=GRID, params=PARAMS, stepper=stepper,
                    mode="ML_STOKES", dtype=jnp.float64)
    state = eng.init_state(T0)
    state, trace = jax.jit(eng.multi_step, static_argnums=1)(
        state, N_STEPS)
    T_ref = np.asarray(ref_states[-1].T[0])
    return temperature_rmse(np.asarray(state.T[0]), T_ref), trace


def test_trained_surrogate_beats_untrained(ground_truth):
    T0, ref_states, store = ground_truth
    ds = SnapshotDataset(store, scale=True, dtype=jnp.float64)

    model = NewFluidNet(levels=2, c_i=7, c_h=8, c_o=1, act_fn="gelu",
                        r_p="learned", loss_type="curl", repeats=2, f=5,
                        p_pred=False)
    rng = np.random.default_rng(0)
    batch = ds.batch(rng, 8)
    w0 = model.init(jax.random.PRNGKey(0), batch["x"])

    opt = optax.adam(2e-3)
    cfg = TrainStepConfig(net="newfluidnet", loss_type="curl",
                          loss_scale=True, loss_derivative=True)
    step = make_train_step(model.apply, opt, cfg)

    w = w0
    opt_state = opt.init(w)
    first = last = None
    for i in range(120):
        w, opt_state, br = step(w, opt_state, ds.batch(rng, 8))
        if i == 0:
            first = float(br.u + br.v)
        last = float(br.u + br.v)
    assert last < first * 0.5, f"training failed to converge: {first}->{last}"

    rmse_untrained, _ = _rollout_rmse(w0, model, T0, ref_states)
    rmse_trained, trace = _rollout_rmse(w, model, T0, ref_states)

    assert np.isfinite(rmse_trained)
    # the trained surrogate must track the physics far better
    assert rmse_trained < 0.6 * rmse_untrained, (
        f"trained {rmse_trained:.4f} vs untrained {rmse_untrained:.4f}")
    # and remain a physically sane temperature field
    assert 0.0 <= float(trace.mean_T[-1]) <= 1.2

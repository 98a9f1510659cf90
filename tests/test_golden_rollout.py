"""Golden-trajectory regression: a fixed-seed coupled rollout must keep
producing the same trace across refactors (SURVEY.md §4: golden-rollout
regression). The fixture is generated once (float64, CPU) and asserted
against checked-in values."""

import numpy as np
import jax
import jax.numpy as jnp

from pbml_mantle_convection_tpu.constants import SimParams
from pbml_mantle_convection_tpu.models import NewFluidNet
from pbml_mantle_convection_tpu.sim.engine import SimEngine
from pbml_mantle_convection_tpu.sim.grid import Grid
from pbml_mantle_convection_tpu.sim.stepper import TimeStepper

# mean-T at steps [10, 20, 30, 40, 50] of the golden run (see _golden()).
GOLDEN_MEAN_T = np.array([
    0.50852435396219, 0.51523988800937, 0.52018929939515,
    0.52298553430237, 0.52387808893873])
GOLDEN_T_SUM = 293.37172980569  # sum of final T field


def _golden():
    grid = Grid(H=20, W=28)
    params = SimParams(raq=4.0, fkt=1e7, fkp=5.0)
    model = NewFluidNet(levels=2, c_i=7, c_h=8, c_o=1, act_fn="gelu",
                        r_p="learned", loss_type="curl", repeats=1, f=5,
                        p_pred=False)
    x0 = jnp.zeros((1, grid.H, grid.W, 7), jnp.float64)
    weights = model.init(jax.random.PRNGKey(42), x0)
    stepper = TimeStepper(grid=grid, params=params,
                          apply_fn=lambda x: model.apply(weights, x),
                          cn_max=0.99, use_pallas=False, dtype=jnp.float64)
    engine = SimEngine(grid=grid, params=params, stepper=stepper,
                       dtype=jnp.float64)
    T0 = jnp.clip(1.0 - grid.yc + 0.05 * jnp.sin(3 * grid.xc), 0, 1)[None]
    state = engine.init_state(T0)
    state, trace = jax.jit(engine.multi_step, static_argnums=1)(state, 50)
    return state, trace


def test_golden_rollout_trace():
    state, trace = _golden()
    mean_T = np.asarray(trace.mean_T)[[9, 19, 29, 39, 49]]
    np.testing.assert_allclose(mean_T, GOLDEN_MEAN_T, rtol=1e-10)
    np.testing.assert_allclose(float(jnp.sum(state.T)), GOLDEN_T_SUM,
                               rtol=1e-10)


if __name__ == "__main__":
    # regenerate the golden values
    state, trace = _golden()
    print("GOLDEN_MEAN_T =", repr(
        np.asarray(trace.mean_T)[[9, 19, 29, 39, 49]]))
    print("GOLDEN_T_SUM =", float(jnp.sum(state.T)))

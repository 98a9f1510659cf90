"""SimEngine rollout tests with a synthetic divergence-free surrogate."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pbml_mantle_convection_tpu.constants import SimParams
from pbml_mantle_convection_tpu.sim.engine import SimEngine, decay_heating
from pbml_mantle_convection_tpu.sim.grid import Grid
from pbml_mantle_convection_tpu.sim.stepper import TimeStepper


def _analytic_surrogate(grid, amp=1.0):
    """A fake Stokes apply_fn: one convection cell from a stream function
    (divergence-free by construction), ignoring its input features."""
    xc = grid.xc.astype(jnp.float64)
    yc = grid.yc.astype(jnp.float64)
    a = amp * jnp.sin(np.pi * yc) * jnp.sin(np.pi * xc / grid.aspect)
    # u = da/dy, v = -da/dx
    u = amp * np.pi * jnp.cos(np.pi * yc) * jnp.sin(np.pi * xc / grid.aspect)
    v = -amp * (np.pi / grid.aspect) * jnp.sin(np.pi * yc) * jnp.cos(
        np.pi * xc / grid.aspect)

    def apply_fn(x):
        b = x.shape[0]
        return (jnp.broadcast_to(u, (b,) + u.shape),
                jnp.broadcast_to(v, (b,) + v.shape), None)

    return apply_fn


def _make_engine(grid=None, **kw):
    grid = grid or Grid(H=24, W=34)
    params = SimParams(raq=2.0, fkt=1e7, fkp=3.0)
    stepper = TimeStepper(
        grid=grid, params=params, apply_fn=_analytic_surrogate(grid),
        cn_max=0.99, dtype=jnp.float64,
        core_cool=kw.get("core_cool", False))
    return SimEngine(grid=grid, params=params, stepper=stepper,
                     dtype=jnp.float64, **kw)


def test_rollout_scan_runs_and_traces():
    eng = _make_engine()
    state = eng.init_state(1.0 - eng.grid.yc[None])
    state, trace, snaps = eng.rollout(state, 50, snapshot_every=25)
    assert trace.mean_T.shape == (50,)
    assert len(snaps) == 2
    assert np.all(np.isfinite(np.asarray(trace.mean_T)))
    # time strictly increases
    assert np.all(np.diff(np.asarray(trace.t)) > 0)
    # BCs hold
    T = np.asarray(state.T[0])
    assert np.allclose(T[0], 1.0) and np.allclose(T[-1], 0.0)


def test_rollout_heats_up_with_internal_heating():
    eng = _make_engine()
    state = eng.init_state(jnp.zeros((1, eng.grid.H, eng.grid.W)))
    _, trace, _ = eng.rollout(state, 200)
    m = np.asarray(trace.mean_T)
    assert m[-1] > m[10]  # internal heating raises mean T


def test_get_state_contract():
    eng = _make_engine()
    state = eng.init_state(1.0 - eng.grid.yc[None])
    state = jax.jit(eng.step)(state)
    d = eng.get_state(state)
    N = eng.grid.H * eng.grid.W
    assert d["T"].shape == (N,)
    assert d["v"].shape == (N, 3)
    assert d["pos"].shape == (N, 2)
    assert set(d) >= {"T", "v", "P", "V", "pos", "time"}


def test_decay_heating():
    assert float(decay_heating(2.0, 0.0, False, jnp.float64)) == 2.0
    # at t=0 the 4 coefficients sum to ~1
    h0 = float(decay_heating(2.0, 0.0, True, jnp.float64))
    np.testing.assert_allclose(h0, 2.0, rtol=2e-3)
    # decays over time
    h1 = float(decay_heating(2.0, 0.5, True, jnp.float64))
    assert h1 < h0


def test_core_cooling_lowers_bottom_temperature():
    eng = _make_engine(core_cool=True)
    state = eng.init_state(1.0 - eng.grid.yc[None])
    state, trace, _ = eng.rollout(state, 300)
    assert float(state.T_core) < 1.0
    T = np.asarray(state.T[0])
    np.testing.assert_allclose(T[0], float(state.T_core), atol=1e-12)


def test_radioactive_decay_reduces_heating_rate():
    e1 = _make_engine()
    e2 = _make_engine(radioactive_decay=True)
    s1 = e1.init_state(jnp.zeros((1, e1.grid.H, e1.grid.W)))
    s2 = e2.init_state(jnp.zeros((1, e2.grid.H, e2.grid.W)))
    _, t1, _ = e1.rollout(s1, 150)
    _, t2, _ = e2.rollout(s2, 150)
    # decay(t>0) < 1 ⇒ less heating accumulated
    assert float(t2.mean_T[-1]) < float(t1.mean_T[-1])


@pytest.mark.slow
def test_unet_engine_rollout():
    """Coupled U-Net rollout (the reference's attempt_unet,
    advect_wi_gaia.py:681-833) as a lax.scan."""
    from pbml_mantle_convection_tpu.models import Unet

    grid = Grid(H=24, W=34)
    params = SimParams(raq=2.0, fkt=1e7, fkp=3.0)
    model = Unet(levels=2, c_i=10, c_h=8, c_o=2, loss_type="curl",
                 repeats=1, f=5, p_pred=False)
    x0 = jnp.zeros((1, grid.H, grid.W, 10), jnp.float64)
    w = model.init(jax.random.PRNGKey(0), x0)

    def apply_fn(x):
        return model.apply(w, x)

    stepper = TimeStepper(grid=grid, params=params, apply_fn=apply_fn,
                          net="unet", dtype=jnp.float64)
    eng = SimEngine(grid=grid, params=params, stepper=stepper,
                    mode="ML", dtype=jnp.float64)
    state = eng.init_state(1.0 - eng.grid.yc[None])
    state, trace, _ = eng.rollout(state, 10)
    assert np.all(np.isfinite(np.asarray(trace.mean_T)))
    T = np.asarray(state.T[0])
    assert np.allclose(T[0], 1.0) and np.allclose(T[-1], 0.0)
    assert float(state.t) > 0


def test_ml_mode_equals_ml_stokes_in_jax_engine():
    """In the pure-JAX engine, ML and ML_STOKES coincide because the
    native energy step was proven equal to the JAX step at rtol 1e-12
    (tests/test_sim_aux.py); the intervene_ts distinction is exercised via
    rollout_native. This states that equivalence as a test (it was only a
    docstring, sim/engine.py:14-17)."""
    e1 = _make_engine(mode="ML", intervene_ts=3)
    e2 = _make_engine(mode="ML_STOKES")
    s1 = e1.init_state(1.0 - e1.grid.yc[None])
    s2 = e2.init_state(1.0 - e2.grid.yc[None])
    s1, t1, _ = e1.rollout(s1, 40)
    s2, t2, _ = e2.rollout(s2, 40)
    np.testing.assert_array_equal(np.asarray(s1.T), np.asarray(s2.T))
    np.testing.assert_array_equal(np.asarray(t1.mean_T),
                                  np.asarray(t2.mean_T))


def test_gaia_momentum_skip_reuses_velocities():
    """mode='GAIA' with intervene_ts>1 = the reference's MMSolverSkip
    (prepare_gaia_ini.py:152): momentum solved every Nth step, stale
    velocities in between."""
    from pbml_mantle_convection_tpu.physics.stokes import make_stokes_fn

    grid = Grid(H=24, W=34)
    fn = make_stokes_fn(grid, raq=2.0, n_iter=300)
    eng = _make_engine(grid=grid, mode="GAIA", intervene_ts=3,
                       stokes_fn=fn)
    T0 = (1.0 - grid.yc + 0.2 * jnp.cos(np.pi * grid.xc / grid.aspect)
          * jnp.sin(np.pi * grid.yc))[None]
    state = eng.init_state(T0)
    step = jax.jit(eng.step)
    us = []
    for _ in range(6):
        state = step(state)
        us.append(np.asarray(state.u))
    # steps 0 (n_step=0) and 3 solve; 1, 2 reuse step-0 velocities
    np.testing.assert_array_equal(us[0], us[1])
    np.testing.assert_array_equal(us[1], us[2])
    assert np.max(np.abs(us[3] - us[2])) > 0
    np.testing.assert_array_equal(us[3], us[4])


def test_ml_pre_mode_refines_toward_iterative_solution():
    """ML_PRE ≠ ML_STOKES: the surrogate prediction is refined by a short
    warm-started PT momentum solve, moving the velocities toward the full
    iterative solution (advect_wi_gaia.py:221,488)."""
    from pbml_mantle_convection_tpu.physics.stokes import make_stokes_fn

    grid = Grid(H=24, W=34)
    fn = make_stokes_fn(grid, raq=2.0, n_iter=3000, pre_iter=400)
    e_pre = _make_engine(grid=grid, mode="ML_PRE", stokes_fn=fn)
    e_ml = _make_engine(grid=grid, mode="ML_STOKES")

    T0 = 1.0 - grid.yc[None]
    s_pre = jax.jit(e_pre.step)(e_pre.init_state(T0))
    s_ml = jax.jit(e_ml.step)(e_ml.init_state(T0))

    # distinct modes: refined velocities differ from the raw surrogate's
    assert float(jnp.max(jnp.abs(s_pre.u - s_ml.u))) > 0

    # the refinement moves toward the full iterative solve
    from pbml_mantle_convection_tpu.physics.viscosity import fk_viscosity
    T = e_ml.init_state(T0).T
    V = fk_viscosity(jnp.asarray(1e7, T.dtype), jnp.asarray(3.0, T.dtype),
                     1.0 - grid.yc.astype(T.dtype), T)
    u_ref, v_ref, _ = fn(T, V)   # cold converged solve
    err_pre = float(jnp.mean(jnp.abs(s_pre.v - v_ref)))
    err_ml = float(jnp.mean(jnp.abs(s_ml.v - v_ref)))
    assert err_pre < err_ml


def test_batched_multi_sim_rollout():
    """B>1 simultaneous simulations in one scan (TPU-native capability)."""
    eng = _make_engine()
    T0 = jnp.stack([1.0 - eng.grid.yc, 0.5 * (1.0 - eng.grid.yc)])
    state = eng.init_state(T0)
    state, trace, _ = eng.rollout(state, 20)
    assert state.T.shape[0] == 2
    assert np.all(np.isfinite(np.asarray(state.T)))


class TestIterativeLegacyStepper:
    """The legacy ifluidnet iterative TS branch
    (pycold-checkpoint.py:283-414)."""

    def _stepper(self, grid):
        from pbml_mantle_convection_tpu.models.registry import (
            ModelConfig, build_model)
        cfg = ModelConfig(network="ifluidnet", levels=2, c_h=4, repeats=1,
                          kernel=3, r_p="zeros", loss_type="curl",
                          p_pred=False, act_fn="gelu", a_bound=10.0,
                          dtype=jnp.float64)
        assert cfg.channels == (9, 1)
        model = build_model(cfg)
        params = SimParams(raq=2.0, fkt=1e6, fkp=3.0)
        x0 = jnp.zeros((1, grid.H, grid.W + 6, 9), jnp.float64)
        weights = model.init(jax.random.PRNGKey(0), x0)
        stepper = TimeStepper(grid=grid, params=params,
                              apply_fn=lambda x: model.apply(weights, x),
                              net="ifluidnet", dtype=jnp.float64)
        return stepper

    def test_iterative_stokes_shapes_and_corners(self):
        grid = Grid(H=24, W=34)
        st = self._stepper(grid)
        T = jnp.clip(1.0 - grid.yc, 0, 1).astype(jnp.float64)[None]
        u, v, p, V = jax.jit(st.stokes_iterative)(T)
        assert u.shape == v.shape == (1, grid.H, grid.W)
        assert p is None  # curl + no p_pred
        for r in (0, -1):
            for c in (0, -1):
                assert float(u[0, r, c]) == 0.0
                assert float(v[0, r, c]) == 0.0
        assert np.all(np.isfinite(np.asarray(u)))

    def test_velocity_feedback_changes_iterates(self):
        """n_iter=2 must differ from n_iter=1: channels 8-9 are live."""
        grid = Grid(H=24, W=34)
        st = self._stepper(grid)
        T = jnp.clip(1.0 - grid.yc + 0.1 * jnp.sin(3 * grid.xc),
                     0, 1).astype(jnp.float64)[None]
        u1, v1, _, _ = st.stokes_iterative(T, n_iter=1)
        u2, v2, _, _ = st.stokes_iterative(T, n_iter=2)
        assert float(jnp.abs(u2 - u1).max()) > 1e-12

    def test_step_iterative_advances_temperature(self):
        grid = Grid(H=24, W=34)
        st = self._stepper(grid)
        T = jnp.clip(1.0 - grid.yc, 0, 1).astype(jnp.float64)[None]
        T_new, dt, u, v, p, V = jax.jit(st.step_iterative)(T)
        assert float(dt) > 0
        # legacy BC stamping: Dirichlet bottom/top, Neumann sides
        assert np.allclose(np.asarray(T_new[0, 0, :]), 1.0)
        assert np.allclose(np.asarray(T_new[0, -1, :]), 0.0)
        assert np.allclose(np.asarray(T_new[0, :, 0]),
                           np.asarray(T_new[0, :, 1]))
        assert np.all(np.isfinite(np.asarray(T_new)))


def test_eba_energy_sources_wiring():
    """Di > 0 engine step carries BOTH EBA terms: the adiabatic
    -Di·v·T and the viscous dissipation +Di·Φ
    (MCEnergy=Boussinesq/Compress, prepare_gaia_ini.py:61-62; Ra=1,
    T0=0). Pins the engine's source wiring against the manual
    composition and checks a Di step is physically distinct from
    Boussinesq."""
    from pbml_mantle_convection_tpu.physics.advection import (
        viscous_dissipation)

    eng0 = _make_engine()
    eng = _make_engine(Di=0.5)
    T0 = (1.0 - eng.grid.yc
          + 0.1 * jnp.sin(2 * np.pi * eng.grid.yc)
          * jnp.cos(np.pi * eng.grid.xc / eng.grid.aspect))[None]
    state = eng.init_state(T0)

    # manual source on the pre-step state, with the step's velocities
    u, v, _, V = eng.stepper.stokes(T0)
    src = eng._energy_sources(state, T0, u, v, V)
    phi = viscous_dissipation(u, v, V, eng.stepper._metrics)
    manual = (2.0
              - 0.5 * v[..., 1:-1, 1:-1] * T0[..., 1:-1, 1:-1]
              + 0.5 * phi)
    np.testing.assert_allclose(np.asarray(src), np.asarray(manual),
                               rtol=1e-14)
    # dissipation is strictly positive somewhere for the analytic cell
    assert float(jnp.max(phi)) > 0

    s_di = jax.jit(eng.step)(state)
    s_b = jax.jit(eng0.step)(eng0.init_state(T0))
    assert np.isfinite(np.asarray(s_di.T)).all()
    # same dt (velocities identical), different energy update
    np.testing.assert_allclose(float(s_di.dt), float(s_b.dt))
    assert float(jnp.max(jnp.abs(s_di.T - s_b.T))) > 0

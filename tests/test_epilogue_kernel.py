"""Fused curl+advection epilogue (ops/epilogue_kernel.py) vs the XLA
composition it replaces (curl_head_padded + advect_diffuse_step +
stamp_temperature_bc + clip — the sim/engine.py step ordering).

The kernel derives (u, v) from raw stream-function differences (the
spatial mean cancels analytically for a scalar a_bound), so agreement
is at the f32 reassociation level, not bitwise — tolerances here pin
that bound.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pbml_mantle_convection_tpu.models import NewFluidNet
from pbml_mantle_convection_tpu.models.fast_path import FastNewFluidNet
from pbml_mantle_convection_tpu.ops.curl import curl_head_padded
from pbml_mantle_convection_tpu.ops.epilogue_kernel import (
    CurlAdvectEpilogue)
from pbml_mantle_convection_tpu.ops.stencils import stamp_temperature_bc
from pbml_mantle_convection_tpu.physics.advection import (
    advect_diffuse_step, grid_metrics)
from pbml_mantle_convection_tpu.constants import SimParams
from pbml_mantle_convection_tpu.sim.engine import SimEngine
from pbml_mantle_convection_tpu.sim.grid import Grid
from pbml_mantle_convection_tpu.sim.stepper import TimeStepper

F32 = jnp.float32


def _reference_epilogue(psi, T, s, src, metrics, a_bound, cn_max):
    """The exact op sequence of sim/engine.py:step after stokes()."""
    y = psi - jnp.mean(psi)
    a = y * a_bound
    u0, v0 = curl_head_padded(a[None])
    u = u0 * s
    v = v0 * s
    T_new, dt = advect_diffuse_step(u, v, T[None], src, metrics,
                                    dt=None, cn_max=cn_max)
    T_new = stamp_temperature_bc(T_new)
    T_new = jnp.clip(T_new, 0.0, 2.0)
    return u[0], v[0], T_new[0], dt


@pytest.mark.parametrize("H,W", [(16, 32), (18, 34)])
def test_kernel_matches_composition(H, W):
    grid = Grid(H=H, W=W, aspect=(W - 2) / (H - 2), dtype="float32")
    metrics = grid_metrics(grid.xc.astype(F32), grid.yc.astype(F32),
                           aspect=grid.aspect)
    rng = np.random.default_rng(3)
    psi = jnp.asarray(rng.normal(size=(H, W)), F32)
    T = jnp.asarray(rng.random((H, W)), F32)
    s = jnp.asarray(37.5, F32)
    src = jnp.asarray(2.3e-3, F32)
    a_bound, cn_max = 4.0, 0.99

    epi = CurlAdvectEpilogue(metrics, H, W, a_bound, cn_max,
                             dtype=F32, interpret=True)
    u1, v1, t1, dt1 = epi(psi, T, s, src)
    u0, v0, t0, dt0 = _reference_epilogue(psi, T, s, src, metrics,
                                          a_bound, cn_max)

    np.testing.assert_allclose(np.asarray(u1), np.asarray(u0),
                               rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v0),
                               rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(float(dt1), float(dt0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t0),
                               rtol=2e-5, atol=1e-5)
    # BC structure: Dirichlet rows, copied side columns, corner zeros
    assert np.all(np.asarray(t1)[0] == 1.0)
    assert np.all(np.asarray(t1)[-1] == 0.0)
    u1 = np.asarray(u1)
    assert u1[0, 0] == 0.0 and u1[-1, -1] == 0.0
    np.testing.assert_allclose(u1[1:-1, 0], -u1[1:-1, 1])


class _PsiNet:
    """Minimal apply_fn implementing the fused-epilogue surrogate
    contract (``apply_psi_from_T`` + curl-head ``__call__`` /
    ``apply_from_T``) WITHOUT the Pallas megakernel executor, so the
    engine-level fused-vs-XLA tests run in seconds under CPU interpret
    mode (the only interpreted kernel left is the small epilogue
    itself). The heavy real-executor variant is the ``slow``-marked
    test below."""

    class _M:
        loss_type = "curl"
        blurr = False
        p_pred = False
        a_bound = 4.0

    m = _M()
    input_hoisted = True

    def bind_input_assembly(self, static, params):
        self._in_static = static
        self._in_params = params
        return True

    @staticmethod
    def _psi(T):
        # smooth nonlinear map standing in for the merge-3 output
        return (jnp.tanh(2.0 * T) + 0.3 * jnp.roll(T, 1, axis=-1)
                - 0.2 * jnp.roll(T, 2, axis=-2))

    def apply_psi_from_T(self, T):
        return self._psi(T)

    def apply_from_T(self, T):
        y = self._psi(T)
        y = y - jnp.mean(y, axis=(1, 2), keepdims=True)
        u, v = curl_head_padded(y * self.m.a_bound)
        return u, v, None

    def __call__(self, x):
        return self.apply_from_T(x[..., 6])


def _mk_engine(disable_fused: bool, apply_fn=None, H=16, W=32):
    grid = Grid(H=H, W=W, aspect=(W - 2) / (H - 2), dtype="float32")
    if apply_fn is None:
        apply_fn = _PsiNet()
    pp = SimParams(3.0, 1e8, 10.0)
    stepper = TimeStepper(grid=grid, params=pp, apply_fn=apply_fn,
                          cn_max=0.99, dtype=F32)
    eng = SimEngine(grid=grid, params=pp, stepper=stepper, dtype=F32)
    if disable_fused:
        # force the XLA composition without the env flag
        object.__setattr__(eng, "_fused_eligible", lambda: False)
    T0 = jnp.clip(1.0 - grid.yc + 0.05 * jnp.sin(6.28 * grid.xc),
                  0, 1).astype(F32)
    return eng, eng.init_state(T0[None])


def _mk_megakernel_engine(disable_fused: bool):
    H, W = 16, 32
    model = NewFluidNet(levels=2, c_i=7, c_h=8, c_o=1, act_fn="gelu",
                        r_p="learned", loss_type="curl", repeats=2, f=5,
                        p_pred=False)
    x = jnp.zeros((1, H, W, 7), F32)
    params = model.init(jax.random.PRNGKey(0), x)
    fast = FastNewFluidNet(model, params, H, W, megakernel=True)
    return _mk_engine(disable_fused, apply_fn=fast, H=H, W=W)


def test_engine_step_fused_equivalence():
    """engine.step through the fused epilogue == the XLA composition
    (same surrogate) at reassociation-level tolerance, including
    across several coupled steps."""
    eng_f, st_f = _mk_engine(disable_fused=False)
    eng_x, st_x = _mk_engine(disable_fused=True)
    assert eng_f._fused_eligible()
    st_f = eng_f.step(st_f)
    st_x = eng_x.step(st_x)
    # one step: pure kernel-vs-composition reassociation bound
    np.testing.assert_allclose(np.asarray(st_f.T), np.asarray(st_x.T),
                               rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(st_f.u), np.asarray(st_x.u),
                               rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(st_f.v), np.asarray(st_x.v),
                               rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(float(st_f.t), float(st_x.t), rtol=1e-5)
    for _ in range(2):
        st_f = eng_f.step(st_f)
        st_x = eng_x.step(st_x)
    # three coupled steps: the (random-weights) surrogate amplifies the
    # f32 reassociation noise through the T→net→u,v feedback — same
    # growth class as the bf16-vs-f32 TPU deviation (PARITY.md); T stays
    # tight, velocities are the network output
    np.testing.assert_allclose(np.asarray(st_f.T), np.asarray(st_x.T),
                               rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(np.asarray(st_f.u), np.asarray(st_x.u),
                               rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(np.asarray(st_f.v), np.asarray(st_x.v),
                               rtol=1e-2, atol=1e-2)
    # the fused path leaves p untouched and fills V
    assert np.all(np.isfinite(np.asarray(st_f.V)))


@pytest.mark.slow
def test_engine_step_fused_equivalence_megakernel():
    """Same equivalence through the REAL megakernel executor (interpret
    mode — heavyweight; the fast _PsiNet variant above runs by
    default)."""
    eng_f, st_f = _mk_megakernel_engine(disable_fused=False)
    eng_x, st_x = _mk_megakernel_engine(disable_fused=True)
    assert eng_f._fused_eligible()
    st_f = eng_f.step(st_f)
    st_x = eng_x.step(st_x)
    np.testing.assert_allclose(np.asarray(st_f.T), np.asarray(st_x.T),
                               rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(st_f.u), np.asarray(st_x.u),
                               rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(st_f.v), np.asarray(st_x.v),
                               rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(float(st_f.t), float(st_x.t), rtol=1e-5)


def test_engine_multi_step_fused_retrace():
    """Regression for the round-3 BENCH crash: jit engine.multi_step
    through the fused-epilogue path at TWO different static lengths in
    one process (exactly what bench.py does: warmup n=20, timed n=500).
    The lazily-built kernel used to cache first-trace tracers on the
    engine and die with UnexpectedTracerError on the second trace."""
    eng_f, st_f = _mk_engine(disable_fused=False)
    eng_x, st_x = _mk_engine(disable_fused=True)
    assert eng_f._fused_eligible()

    jit_f = jax.jit(eng_f.multi_step, static_argnums=1)
    jit_x = jax.jit(eng_x.multi_step, static_argnums=1)

    sf, trf = jit_f(st_f, 2)       # first trace
    sf, trf = jit_f(sf, 3)         # RETRACE with a new static length
    sx, trx = jit_x(st_x, 2)
    sx, trx = jit_x(sx, 3)
    np.testing.assert_allclose(np.asarray(sf.T), np.asarray(sx.T),
                               rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(np.asarray(trf.mean_T),
                               np.asarray(trx.mean_T),
                               rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(np.asarray(trf.t), np.asarray(trx.t),
                               rtol=1e-4)

    # and through an OUTER scan wrapping the step (rollout-shaped)
    def outer(s, n):
        def body(s, _):
            s = eng_f.step(s)
            return s, s.t
        return jax.lax.scan(body, s, None, length=n)

    s2, ts = jax.jit(outer, static_argnums=1)(st_f, 2)
    s2, ts = jax.jit(outer, static_argnums=1)(s2, 3)
    np.testing.assert_allclose(float(s2.t), float(sf.t), rtol=1e-5)


def test_engine_fused_gates():
    """Ineligible configs (Di > 0, f64, core_cool) keep the XLA path."""
    eng, _ = _mk_engine(disable_fused=False)
    assert SimEngine(grid=eng.grid, params=eng.params,
                     stepper=eng.stepper, Di=0.5,
                     dtype=F32)._fused_eligible() is False
    assert SimEngine(grid=eng.grid, params=eng.params,
                     stepper=eng.stepper, core_cool=True,
                     dtype=F32)._fused_eligible() is False
    assert not SimEngine(grid=eng.grid, params=eng.params,
                         stepper=eng.stepper,
                         dtype=jnp.float64)._fused_eligible()

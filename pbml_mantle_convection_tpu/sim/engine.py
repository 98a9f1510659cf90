"""SimEngine — the coupled mantle-convection rollout, fully on device.

TPU-native redesign of the reference's GAIA-coupled rollout driver
(advect_wi_gaia.py:538-833). The reference exchanges numpy buffers with an
external C++ solver every step (``state["v"|"P"|"T"|"V"]``,
advect_wi_gaia.py:603-637); here the whole coupled step — surrogate Stokes
solve, velocity unscaling, explicit energy update, BC stamping, optional
radioactive-decay / core-cooling evolution — is one jitted function, and a
rollout is a single ``lax.scan``. Per-step scalars (mean T, dt, wall proxy)
stream out of the scan; full-field snapshots are captured between scan
chunks so memory stays bounded.

Modes (advect_wi_gaia.py:218-222):
  * ``ML``        — surrogate Stokes + explicit ADNet temperature update;
                    every ``intervene_ts`` steps the engine's own energy
                    step stands in for GAIA's (they coincide in-framework).
  * ``ML_STOKES`` — surrogate Stokes + engine energy step every step.
  * ``ML_PRE``    — surrogate Stokes *warm-starting* a short iterative
                    momentum solve (advect_wi_gaia.py:221,488 "ml stokes
                    prediction with iterative solver"): the prediction
                    initializes the PT solver, which refines it in
                    ~n_iter/10 iterations; energy by the engine step.
  * ``GAIA``      — no surrogate: velocities from the iterative variable-
                    viscosity Stokes solver (physics/stokes.py), energy by
                    the same explicit step. Verification-grade stand-in for
                    the external GAIA binary.

The native C++ engine (native/, sim/gaia_native.py) exposes the same state
contract (``getState()``-like dict with T, v, P, V, pos, time and
``doTimestep()``) for host-side verification.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import SimParams
from ..ops.stencils import stamp_temperature_bc
from ..utils.jit import tpu_jit
from .grid import Grid
from .stepper import TimeStepper

# 4-component radioactive-decay constants (prepare_gaia_ini.py:81-92).
DECAY_LAMBDAS = (14.200767386369366, 90.1668042856123,
                 4.534102158362219, 50.78194417365685)
DECAY_COEFFS = (0.130448695228009, 0.2345333106414419,
                0.07981198571490902, 0.55520600841564)
CORE_RHOCP_VAR = 0.7058823529411765  # Core/rhoCpVar (prepare_gaia_ini.py:91)


class SimState(NamedTuple):
    """Device-resident simulation state (the GAIA ``getState()`` pytree)."""

    T: jnp.ndarray        # (B, H, W) temperature
    u: jnp.ndarray        # (B, H, W)
    v: jnp.ndarray        # (B, H, W)
    p: jnp.ndarray        # (B, H, W)
    V: jnp.ndarray        # (B, H, W) viscosity
    t: jnp.ndarray        # scalar time
    dt: jnp.ndarray       # scalar last dt
    n_step: jnp.ndarray   # scalar int step counter
    T_core: jnp.ndarray   # scalar bottom (CMB) temperature


class RolloutTrace(NamedTuple):
    """Per-step scalar records (the reference's T_vec/t_vec,
    advect_wi_gaia.py:645-652)."""

    mean_T: jnp.ndarray
    t: jnp.ndarray
    dt: jnp.ndarray


def decay_heating(raq: float, t, radioactive_decay: bool, dtype):
    """Internal heating at time t: RaQ * Σ c_i exp(-λ_i t) when decay is on
    (GAIA RadioactiveDecay module, prepare_gaia_ini.py:81-92)."""
    raq = jnp.asarray(raq, dtype)
    if not radioactive_decay:
        return raq
    lam = jnp.asarray(DECAY_LAMBDAS, dtype)
    cf = jnp.asarray(DECAY_COEFFS, dtype)
    return raq * jnp.sum(cf * jnp.exp(-lam * t))


@dataclasses.dataclass(frozen=True)
class SimEngine:
    """See module docstring.

    stokes_fn: for mode="GAIA", a (T, V) -> (u, v, p) solver; otherwise the
    surrogate inside ``stepper`` is used.
    """

    grid: Grid
    params: SimParams
    stepper: TimeStepper
    mode: str = "ML_STOKES"
    intervene_ts: int = 1
    radioactive_decay: bool = False
    core_cool: bool = False
    Di: float = 0.0
    stokes_fn: Optional[Callable] = None
    dtype: Any = jnp.float32

    # ------------------------------------------------------------------
    # state construction / GAIA state contract
    # ------------------------------------------------------------------

    def init_state(self, T0, T_core: float = 1.0) -> SimState:
        T0 = jnp.asarray(T0, self.dtype)
        if T0.ndim == 2:
            T0 = T0[None]
        z = jnp.zeros_like(T0)
        return SimState(
            T=T0, u=z, v=z, p=z, V=jnp.ones_like(T0),
            t=jnp.asarray(0.0, self.dtype),
            dt=jnp.asarray(0.0, self.dtype),
            n_step=jnp.asarray(0, jnp.int32),
            T_core=jnp.asarray(T_core, self.dtype),
        )

    def get_state(self, state: SimState) -> dict:
        """Host-side dict matching the GAIA ``Direct.getState()`` contract
        (advect_wi_gaia.py:546-637): T, v (N,3), P, V, pos, time."""
        T = np.asarray(state.T[0]).reshape(-1)
        u = np.asarray(state.u[0]).reshape(-1, 1)
        v = np.asarray(state.v[0]).reshape(-1, 1)
        return {
            "T": T,
            "v": np.concatenate([u, v, np.zeros_like(u)], axis=1),
            "P": np.asarray(state.p[0]).reshape(-1),
            "V": np.asarray(state.V[0]).reshape(-1),
            "pos": np.asarray(self.grid.pos),
            "time": float(state.t),
        }

    # ------------------------------------------------------------------
    # single step
    # ------------------------------------------------------------------

    def _energy_sources(self, state: SimState, T, u, v, V):
        """Internal heating (+ the EBA terms for Di > 0)."""
        src = decay_heating(self.params.raq, state.t,
                            self.radioactive_decay, self.dtype)
        if self.Di > 0.0:
            # Extended-Boussinesq terms (GAIA MCEnergy=
            # Boussinesq/Compress, prepare_gaia_ini.py:61-62):
            # adiabatic heating/cooling -Di·v·(T+T0) with T0 = 0
            # (prepare_gaia_ini.py:125), plus viscous dissipation
            # +(Di/Ra)·Φ with Ra = 1 (prepare_gaia_ini.py:117);
            # cross-validated against the native engine at rtol 1e-12
            # (tests/test_sim_aux.py::test_eba_energy_step_matches_jax).
            from ..physics.advection import viscous_dissipation
            src = (src
                   - self.Di * v[..., 1:-1, 1:-1] * T[..., 1:-1, 1:-1]
                   + self.Di * viscous_dissipation(
                       u, v, V, self.stepper._metrics))
        return src

    def __post_init__(self):
        # Build the fused curl+advection epilogue EAGERLY, outside any
        # trace (BENCH_r03 died because the round-3 code built it lazily
        # during the first jit trace and cached that trace's tracers on
        # the engine — UnexpectedTracerError on retrace). The kernel
        # itself holds only numpy constants now, but constructing it
        # here also hoists the env-flag read and all static gates out of
        # the per-step path. `_epi` is None whenever the fused path is
        # statically ineligible.
        import os
        from ..ops.epilogue_kernel import FUSED_MAX_HW
        env = os.environ.get("PMC_NO_FUSED_EPILOGUE", "")
        fn = self.stepper.apply_fn
        m = getattr(fn, "m", None)
        epi = None
        if (env in ("", "0")
                and self.Di == 0.0 and not self.core_cool
                and not self.stepper.use_pallas
                and jnp.dtype(self.dtype).itemsize == 4
                and self.grid.H * self.grid.W <= FUSED_MAX_HW
                and hasattr(fn, "apply_psi_from_T")
                and m is not None
                and m.loss_type not in ("mae", "mass")
                and not getattr(m, "blurr", False)
                and not getattr(m, "p_pred", False)):
            from ..ops.epilogue_kernel import CurlAdvectEpilogue
            epi = CurlAdvectEpilogue(
                self.stepper._metrics, self.grid.H, self.grid.W,
                a_bound=m.a_bound, cn_max=self.stepper.cn_max,
                dtype=self.dtype,
                interpret=jax.default_backend() != "tpu")
        object.__setattr__(self, "_epi", epi)

    def _fused_eligible(self) -> bool:
        """Static gate for the fused curl+advection epilogue — all the
        conditions are evaluated once in __post_init__."""
        return self._epi is not None

    def step_unet(self, state: SimState) -> SimState:
        """One coupled U-Net step: the network advances (u, v, T) jointly;
        dt comes from the driver-level CFL rule
        (advect_wi_gaia.py:734-797, ``attempt_unet``)."""
        s = self.stepper.scaler
        u_prev = state.u / s
        v_prev = state.v / s
        dt = self.stepper.unet_dt(u_prev, v_prev)
        p_prev = state.p if self.stepper.unet_p_pred else None
        T_new, u, v, p, V = self.stepper.step_unet(
            state.T, u_prev, v_prev, dt, p_prev=p_prev)
        if p is None:
            p = state.p
        return SimState(
            T=T_new, u=u, v=v, p=p, V=V,
            t=state.t + dt, dt=dt, n_step=state.n_step + 1,
            T_core=state.T_core)

    def step(self, state: SimState) -> SimState:
        """One coupled simulation step, pure and jittable."""
        if self.stepper.net in ("unet", "iunet") and self.mode != "GAIA":
            return self.step_unet(state)
        T = state.T

        if self.mode == "GAIA":
            if self.stokes_fn is None:
                raise ValueError("mode='GAIA' requires stokes_fn")
            from ..physics.viscosity import fk_viscosity
            V = fk_viscosity(
                jnp.asarray(self.params.fkt, T.dtype),
                jnp.asarray(self.params.fkp, T.dtype),
                1.0 - self.grid.yc.astype(T.dtype), T)
            if self.intervene_ts > 1:
                # momentum-skip mode (GAIA MMSolverSkip,
                # prepare_gaia_ini.py:152 / the reference speedup study's
                # "GAIA-100-momentum-skips" configuration): solve momentum
                # every intervene_ts-th step, advect with stale velocities
                # in between.
                u, v, p = jax.lax.cond(
                    state.n_step % self.intervene_ts == 0,
                    lambda _: self.stokes_fn(T, V),
                    lambda _: (state.u, state.v, state.p),
                    None)
            else:
                u, v, p = self.stokes_fn(T, V)
        elif self.mode == "ML_PRE":
            # ML_PRE: the surrogate's velocities warm-start a *short*
            # iterative momentum solve (the reference's "ml stokes
            # prediction with iterative solver", advect_wi_gaia.py:221,488;
            # prepare_gaia_ini.py:146) — distinct from ML_STOKES, which
            # uses the surrogate's velocities directly.
            if self.stokes_fn is None:
                raise ValueError("mode='ML_PRE' requires stokes_fn")
            u_s, v_s, p_s, V = self.stepper.stokes(T)
            if p_s is None:
                p_s = state.p
            u, v, p = self.stokes_fn(T, V, (u_s, v_s, p_s))
        else:
            sp = self._fused_eligible() and self.stepper.stokes_psi(T)
            if sp:
                # fused epilogue: curl head + advection + BCs/clip in
                # one Pallas kernel (ops/epilogue_kernel.py) — replaces
                # the ~0.09 ms/step of XLA glue after the merge-3
                # megakernel. Numerically the reassociation-level
                # deviation is bounded by tests; falls back below (and
                # under PMC_NO_FUSED_EPILOGUE=1) to the XLA composition.
                psi, V, s = sp
                src = decay_heating(self.params.raq, state.t,
                                    self.radioactive_decay, self.dtype)
                u, v, T_new, dt = self._epi(psi[0], T[0], s, src)
                return SimState(
                    T=T_new[None], u=u[None], v=v[None], p=state.p, V=V,
                    t=state.t + dt, dt=dt, n_step=state.n_step + 1,
                    T_core=state.T_core)
            u, v, p, V = self.stepper.stokes(T)
            if p is None:
                p = state.p

        src = self._energy_sources(state, T, u, v, V)
        T_new, dt = self.stepper.advect_fn(
            u, v, T, src, self.stepper._metrics, dt=None,
            cn_max=self.stepper.cn_max, core_cool=self.core_cool)

        T_core = state.T_core
        if self.core_cool:
            # Core cooling: the CMB temperature decreases with the heat
            # flux extracted through the bottom boundary, scaled by
            # Core/rhoCpVar (prepare_gaia_ini.py:70-71, 91). q_cmb is the
            # mean upward conductive flux -dT/dy between the CMB (row 0,
            # on the boundary) and the first interior cell centre at
            # dy/2 above it (positive when the mantle above is cooler).
            q_cmb = jnp.mean(
                (state.T_core - T_new[..., 1, :]) / (0.5 * self.grid.dy))
            T_core = T_core - dt * CORE_RHOCP_VAR * q_cmb
            T_new = T_new.at[..., 0, :].set(T_core)

        T_new = stamp_temperature_bc(T_new, core_cool=self.core_cool)
        T_new = jnp.clip(T_new, 0.0, 2.0)

        return SimState(
            T=T_new, u=u, v=v, p=p, V=V,
            t=state.t + dt, dt=dt, n_step=state.n_step + 1,
            T_core=T_core)

    # ------------------------------------------------------------------
    # rollout
    # ------------------------------------------------------------------

    def multi_step(self, state: SimState, n_steps: int):
        """n_steps coupled steps as one lax.scan; returns the final state
        and the per-step scalar trace. This replaces the reference's
        per-step Python loop (advect_wi_gaia.py:583-677)."""

        def body(s, _):
            s = self.step(s)
            return s, RolloutTrace(mean_T=jnp.mean(s.T), t=s.t, dt=s.dt)

        return jax.lax.scan(body, state, None, length=n_steps)

    def rollout(self, state: SimState, n_steps: int,
                snapshot_every: Optional[int] = None):
        """Run ``n_steps``; optionally capture full-field snapshots every
        ``snapshot_every`` steps (between jitted scan chunks, so device
        memory stays at one state). Returns (state, trace, snapshots)."""
        jitted = tpu_jit(self.multi_step, static_argnums=1)
        if not snapshot_every:
            state, trace = jitted(state, n_steps)
            return state, trace, []

        snapshots = []
        traces = []
        done = 0
        while done < n_steps:
            k = min(snapshot_every, n_steps - done)
            state, tr = jitted(state, k)
            traces.append(tr)
            snapshots.append(jax.device_get(
                {"T": state.T, "u": state.u, "v": state.v,
                 "p": state.p, "V": state.V, "t": state.t}))
            done += k
        trace = jax.tree.map(lambda *xs: jnp.concatenate(xs), *traces)
        return state, trace, snapshots

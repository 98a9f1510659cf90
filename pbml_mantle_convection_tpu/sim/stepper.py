"""TS — the coupled surrogate time-stepper.

TPU-native redesign of the reference ``TS`` eval wrapper
(pytorch_networks_convae.py:266-475): per step it computes the FK viscosity
from the current temperature, assembles the surrogate input channels, runs
the Stokes surrogate, unscales the velocities, and (optionally) advances
the temperature with the explicit advection–diffusion solver.

Everything here is a pure function so the whole coupled step jits and scans;
the reference's per-step host↔device and Python↔C++ boundaries
(advect_wi_gaia.py:595-637) disappear.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..constants import (
    COORD_SCALE, SimParams, velocity_scaler, visc_feature)
from ..ops.stencils import stamp_temperature_bc
from ..physics.advection import (
    GridMetrics, advect_diffuse_step, grid_metrics)
from ..physics.viscosity import fk_viscosity
from .grid import Grid


class StaticFields(NamedTuple):
    """Per-grid constant feature planes, hoisted out of the scan."""

    xc_feat: jnp.ndarray   # xc / 4
    yc_feat: jnp.ndarray   # yc / 4
    raq_nd: jnp.ndarray    # broadcast plane
    fkt_nd: jnp.ndarray
    fkp_nd: jnp.ndarray


def make_static_fields(grid: Grid, params: SimParams, dtype=jnp.float32
                       ) -> StaticFields:
    xc = grid.xc.astype(dtype)
    yc = grid.yc.astype(dtype)
    shape = xc.shape
    return StaticFields(
        xc_feat=xc / COORD_SCALE,
        yc_feat=yc / COORD_SCALE,
        raq_nd=jnp.full(shape, params.raq_nd, dtype=dtype),
        fkt_nd=jnp.full(shape, params.fkt_nd, dtype=dtype),
        fkp_nd=jnp.full(shape, params.fkp_nd, dtype=dtype),
    )


def assemble_fluidnet_input(T, static: StaticFields, params: SimParams):
    """7-channel NHWC input (xc/4, yc/4, log10(V)/8, raq_nd, fkt_nd,
    fkp_nd, T) — reference: pytorch_networks_convae.py:388-407.

    T: (B, H, W). Returns (B, H, W, 7) and the viscosity field V (clipped).
    """
    yc = static.yc_feat * COORD_SCALE
    V = jnp.clip(
        fk_viscosity(jnp.asarray(params.fkt, T.dtype),
                     jnp.asarray(params.fkp, T.dtype),
                     1.0 - yc, T),
        1e-8, 1.0)
    b = T.shape[0]

    def bcast(p):
        return jnp.broadcast_to(p, (b,) + p.shape)

    x = jnp.stack(
        [bcast(static.xc_feat), bcast(static.yc_feat), visc_feature(V),
         bcast(static.raq_nd), bcast(static.fkt_nd), bcast(static.fkp_nd),
         T],
        axis=-1,
    )
    return x, V


def assemble_unet_input(T, u_prev, v_prev, dt, static: StaticFields,
                        params: SimParams, p_prev=None):
    """10/11-channel NHWC U-Net input (xc/4, yc/4, dt, raq_nd, fkt_nd,
    fkp_nd, log10(V)/8, T, u_prev, v_prev[, p_prev]) — reference:
    pytorch_networks_convae.py:419-441, datasetio.py:258-274 (the
    reference never assembles the 11th p channel; see TimePairDataset)."""
    yc = static.yc_feat * COORD_SCALE
    V = fk_viscosity(jnp.asarray(params.fkt, T.dtype),
                     jnp.asarray(params.fkp, T.dtype), 1.0 - yc, T)
    Vf = visc_feature(V)
    b = T.shape[0]

    def bcast(p):
        return jnp.broadcast_to(p, (b,) + p.shape)

    dt_plane = jnp.broadcast_to(jnp.asarray(dt, T.dtype), T.shape)
    chans = [bcast(static.xc_feat), bcast(static.yc_feat), dt_plane,
             bcast(static.raq_nd), bcast(static.fkt_nd),
             bcast(static.fkp_nd), Vf, T, u_prev, v_prev]
    if p_prev is not None:
        chans.append(p_prev)
    x = jnp.stack(chans, axis=-1)
    return x, V


def assemble_ifluidnet_input(T, u, v, grid: Grid, static: StaticFields,
                             params: SimParams):
    """9-channel legacy NHWC input (sdf, sdf2, log10(V)/8, raq_nd, fkt_nd,
    fkp_nd, T, u, v) of the iterative-fluidnet TS branch — reference:
    pycold-checkpoint.py:326-341 (sdf/sdf2 boundary rings replace the
    xc/yc coordinate channels; the running velocity iterate is fed back
    as channels 8-9).

    T, u, v: (B, H, W). Returns (B, H, W, 9) and the clipped viscosity.
    """
    yc = static.yc_feat * COORD_SCALE
    V = jnp.clip(
        fk_viscosity(jnp.asarray(params.fkt, T.dtype),
                     jnp.asarray(params.fkp, T.dtype),
                     1.0 - yc, T),
        1e-8, 1.0)
    b = T.shape[0]

    def bcast(p):
        return jnp.broadcast_to(p.astype(T.dtype), (b,) + p.shape)

    x = jnp.stack(
        [bcast(grid.sdf), bcast(grid.sdf2), visc_feature(V),
         bcast(static.raq_nd), bcast(static.fkt_nd), bcast(static.fkp_nd),
         T, u, v],
        axis=-1,
    )
    return x, V


def _zero_corners(f):
    """Zero the four corner cells of a (B, H, W) field
    (pycold-checkpoint.py:384-399)."""
    for r in (0, -1):
        for c in (0, -1):
            f = f.at[..., r, c].set(0.0)
    return f


@dataclasses.dataclass(frozen=True)
class TimeStepper:
    """Coupled Stokes-surrogate + advection step (the reference ``TS``).

    apply_fn: (x_nhwc) -> (u, v, p|None) for fluidnet nets, or
              (x_nhwc) -> (u, v, p|None, T) for the unet.
    """

    grid: Grid
    params: SimParams
    apply_fn: Callable[..., Any]
    net: str = "newfluidnet"
    unet_p_pred: bool = False     # feed the 11th (p_prev) U-Net channel
    advect: bool = True           # run the AD temperature update (mode "ML")
    cn_max: float = 0.99
    core_cool: bool = False
    use_pallas: bool = False   # opt-in: measured slower than XLA's fused
    dtype: Any = jnp.float32   # elementwise path inside the rollout scan

    @property
    def advect_fn(self):
        """The energy-update implementation. The Pallas kernel
        (ops/pallas_kernels.py) is opt-in: inside the rollout scan XLA
        fuses the advection into neighbouring ops and measures ~1 ms/step
        faster than the standalone kernel at 256²."""
        use = self.use_pallas
        if use:
            from ..ops.pallas_kernels import advect_diffuse_step_pallas
            return advect_diffuse_step_pallas
        return advect_diffuse_step

    def __post_init__(self):
        object.__setattr__(self, "_static",
                           make_static_fields(self.grid, self.params,
                                              self.dtype))
        object.__setattr__(
            self, "_metrics",
            grid_metrics(self.grid.xc.astype(self.dtype),
                         self.grid.yc.astype(self.dtype),
                         aspect=self.grid.aspect))

    @property
    def scaler(self):
        return jnp.asarray(
            velocity_scaler(self.params.raq, self.params.fkt,
                            self.params.fkp), self.dtype)

    def stokes(self, T):
        """Surrogate Stokes solve from temperature: returns (u, v, p, V)
        in physical (unscaled) units. Reference:
        pytorch_networks_convae.py:377-417.

        When ``apply_fn`` is a megakernel ``FastNewFluidNet``, the
        input assembly is hoisted (bind_input_assembly): only the T
        channel is relayouted per step — bitwise-identical outputs."""
        fn = self.apply_fn
        if hasattr(fn, "bind_input_assembly"):
            if (getattr(fn, "_in_params", None) is not self.params
                    or getattr(fn, "_in_static", None) is not self._static):
                fn.bind_input_assembly(self._static, self.params)
            if fn.input_hoisted:
                V = jnp.clip(
                    fk_viscosity(jnp.asarray(self.params.fkt, T.dtype),
                                 jnp.asarray(self.params.fkp, T.dtype),
                                 1.0 - self._static.yc_feat * COORD_SCALE,
                                 T),
                    1e-8, 1.0)
                if T.shape[0] == 1:
                    u, v, p = fn.apply_from_T(T)
                else:
                    # B>1: advance each sim through the B=1 megakernel
                    # executor sequentially (lax.map) — on one chip this
                    # out-throughputs the batched standard path ~2×
                    # (PERF.md round 3, batched rollouts)
                    p_pred = bool(getattr(fn.m, "p_pred", False))

                    def one(Ti):
                        uu, vv, pp = fn.apply_from_T(Ti[None])
                        return ((uu[0], vv[0], pp[0]) if p_pred
                                else (uu[0], vv[0]))

                    outs = jax.lax.map(one, T)
                    u, v = outs[0], outs[1]
                    p = outs[2] if p_pred else None
                s = self.scaler
                return u * s, v * s, p, V
        x, V = assemble_fluidnet_input(T, self._static, self.params)
        u, v, p = self.apply_fn(x)
        s = self.scaler
        u = u * s
        v = v * s
        return u, v, p, V

    def stokes_psi(self, T):
        """Raw stream function + viscosity for the fused curl+advection
        epilogue (ops/epilogue_kernel.py).

        Returns (psi, V, scaler) when the megakernel T-only path is
        active and the model is a plain curl head (no blur, no
        pressure output); ``None`` otherwise (caller falls back to
        :meth:`stokes` + the XLA advection composition).
        """
        fn = self.apply_fn
        if not hasattr(fn, "apply_psi_from_T") or T.shape[0] != 1:
            return None
        m = fn.m
        if (m.loss_type in ("mae", "mass") or getattr(m, "blurr", False)
                or getattr(m, "p_pred", False)):
            return None
        if (getattr(fn, "_in_params", None) is not self.params
                or getattr(fn, "_in_static", None) is not self._static):
            fn.bind_input_assembly(self._static, self.params)
        if not fn.input_hoisted:
            return None
        V = jnp.clip(
            fk_viscosity(jnp.asarray(self.params.fkt, T.dtype),
                         jnp.asarray(self.params.fkp, T.dtype),
                         1.0 - self._static.yc_feat * COORD_SCALE, T),
            1e-8, 1.0)
        return fn.apply_psi_from_T(T), V, self.scaler

    def stokes_iterative(self, T, n_iter: int = 1):
        """The legacy ``ifluidnet`` iterative Stokes solve
        (pycold-checkpoint.py:322-343): the surrogate takes the previous
        velocity iterate as input channels 8-9 (zeros on the first pass)
        and is re-applied ``n_iter`` times; the input is replicate-padded
        (3,3,0,0) in W and the outputs cropped back (:339-343), matching
        the legacy FluidNet-era pre-padding. Unscaling and corner zeroing
        happen after the loop (:363-399).

        Returns (u, v, p, V) with u, v in physical (unscaled) units.
        ``n_iter`` is static (the checkpoint runs the loop once, :326).
        """
        u = jnp.zeros_like(T)
        v = jnp.zeros_like(T)
        p = None
        V = None
        for _ in range(n_iter):
            x, V = assemble_ifluidnet_input(T, u, v, self.grid,
                                            self._static, self.params)
            x = jnp.pad(x, ((0, 0), (0, 0), (3, 3), (0, 0)), mode="edge")
            u, v, p = self.apply_fn(x)
            u = u[..., 3:-3]
            v = v[..., 3:-3]
            if p is not None:
                p = p[..., 3:-3]
        s = self.scaler
        u = _zero_corners(u * s)
        v = _zero_corners(v * s)
        if p is not None:
            p = _zero_corners(p)
        return u, v, p, V

    def step_iterative(self, T, dt=None, n_iter: int = 1):
        """One coupled legacy step: iterative Stokes + the explicit AD
        temperature update with BC stamping (pycold-checkpoint.py:401-414;
        the AD input quadruple is (u, v, T, raq) there as here).

        Returns (T_new, dt, u, v, p, V) like :meth:`step`.
        """
        u, v, p, V = self.stokes_iterative(T, n_iter=n_iter)
        if not self.advect:
            return T, jnp.asarray(0.0, T.dtype), u, v, p, V
        raq = jnp.asarray(self.params.raq, T.dtype)
        T_new, dt = self.advect_fn(
            u, v, T, raq, self._metrics, dt=dt, cn_max=self.cn_max,
            core_cool=self.core_cool)
        T_new = stamp_temperature_bc(T_new, core_cool=self.core_cool)
        return T_new, dt, u, v, p, V

    def step(self, T, dt=None):
        """One coupled step for the fluidnet family: Stokes surrogate then
        (optionally) the explicit AD temperature update with BC stamping.
        Reference: pytorch_networks_convae.py:377-473.

        Returns (T_new, dt, u, v, p, V).
        """
        u, v, p, V = self.stokes(T)
        if not self.advect:
            return T, jnp.asarray(0.0, T.dtype), u, v, p, V
        raq = jnp.asarray(self.params.raq, T.dtype)
        T_new, dt = self.advect_fn(
            u, v, T, raq, self._metrics, dt=dt, cn_max=self.cn_max,
            core_cool=self.core_cool)
        T_new = stamp_temperature_bc(T_new, core_cool=self.core_cool)
        return T_new, dt, u, v, p, V

    def unet_dt(self, u_prev, v_prev, cn_max: float = 100.0):
        """Driver-level CFL dt of the U-Net rollout
        (advect_wi_gaia.py:739-747). Velocities are *scaled* inputs."""
        s = self.scaler
        dx_min = 0.5 * self.grid.dy
        uv_mag = jnp.maximum(jnp.max(jnp.abs(u_prev * s)),
                             jnp.max(jnp.abs(v_prev * s)))
        dt_advect = 0.5 * cn_max * dx_min / uv_mag
        dt_diffuse = 0.5 * (dx_min * dx_min) ** 2 / (2.0 * dx_min**2)
        return jnp.minimum(dt_advect, dt_diffuse)

    def step_unet(self, T, u_prev, v_prev, dt, p_prev=None):
        """One coupled step for the U-Net: the network predicts both the
        stream function and the new temperature. u_prev/v_prev are in
        scaled units. Reference: pytorch_networks_convae.py:419-451,
        advect_wi_gaia.py:734-797.

        Returns (T_new, u, v, p, V) with u, v unscaled (physical).
        """
        x, V = assemble_unet_input(T, u_prev, v_prev, dt, self._static,
                                   self.params, p_prev=p_prev)
        u, v, p, T_new = self.apply_fn(x)
        T_new = stamp_temperature_bc(T_new, core_cool=self.core_cool)
        T_new = jnp.clip(T_new, 0.0, 2.0)
        s = self.scaler
        return T_new, u * s, v * s, p, V

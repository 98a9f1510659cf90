"""Explicit upwind advection–diffusion temperature stepper ("ADNet").

TPU-native redesign of the reference's non-learned ``ADNet`` module
(pytorch_networks_convae.py:478-568): a metric-aware first-order upwind
advection + conservative Laplacian diffusion + internal-heating source, with
an adaptive CFL/diffusive time step, explicit Euler update, replicate
padding and Dirichlet top/bottom boundaries.

Everything is a pure function of arrays so it jits, vmaps and scans cleanly.
A fused Pallas kernel for the hot rollout path lives in
``ops/pallas_kernels.py``; this module is the canonical XLA implementation
(also used to verify the kernel).

A WENO5 variant slot mirrors the reference's (flagged-buggy) ``ADNetWENO``
(ad_nets-checkpoint.py:25-147) — see :func:`advect_diffuse_step_weno`.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from ..ops.stencils import (
    dx_left, dx_right, dy_top, dy_bot, replicate_pad)


class GridMetrics(NamedTuple):
    """Precomputed interior one-sided metric terms, each (H-2, W-2).

    Reference computes these from the coordinate channels every step
    (pytorch_networks_convae.py:537-540); they are constant per grid so we
    hoist them out of the scan.
    """

    dx_l: jnp.ndarray
    dx_r: jnp.ndarray
    dy_t: jnp.ndarray
    dy_b: jnp.ndarray

    @property
    def dx_min(self):
        return jnp.min(self.dx_l)


def grid_metrics(xc, yc, aspect: float = 4.0) -> GridMetrics:
    """Metric terms from (H, W) coordinate fields, with the reference's
    boundary clamping (pytorch_networks_convae.py:532-540)."""
    xc = xc.at[..., :, 0].set(0.0)
    xc = xc.at[..., :, -1].set(aspect)
    yc = yc.at[..., 0, :].set(0.0)
    yc = yc.at[..., -1, :].set(1.0)
    return GridMetrics(
        dx_l=dx_left(xc)[..., 1:-1, :],
        dx_r=dx_right(xc)[..., 1:-1, :],
        dy_t=dy_top(yc)[..., :, 1:-1],
        dy_b=dy_bot(yc)[..., :, 1:-1],
    )


def stability_dt(u_int, v_int, dx_min, cn_max: float = 0.1):
    """Adaptive dt = min(advective CFL, explicit diffusive limit).

    Reference: pytorch_networks_convae.py:554-559. Note the diffusive limit
    simplifies to 0.25*dx_min² (the reference writes it as
    0.5*(dx²)²/(dx²+dx²)).
    """
    uv_mag = jnp.maximum(jnp.max(jnp.abs(u_int)), jnp.max(jnp.abs(v_int)))
    dt_advect = 0.5 * cn_max * dx_min / uv_mag
    dt_diffuse = 0.5 * (dx_min * dx_min) ** 2 / (dx_min**2 + dx_min**2)
    return jnp.minimum(dt_advect, dt_diffuse)


def advect_diffuse_step(
    u,
    v,
    T,
    raq_ra,
    metrics: GridMetrics,
    dt: Optional[jnp.ndarray] = None,
    cn_max: float = 0.1,
    bottom_T: float = 1.0,
    top_T: float = 0.0,
    core_cool: bool = False,
):
    """One explicit upwind advection–diffusion Euler step.

    Args:
        u, v: (..., H, W) velocity fields (full grid; interior is used).
        T: (..., H, W) temperature.
        raq_ra: scalar or (..., H-2, W-2) internal-heating source RaQ/Ra.
        metrics: precomputed :class:`GridMetrics`.
        dt: optional time step; computed adaptively when ``None``
            (pytorch_networks_convae.py:554-559).
        cn_max: CFL number bound.
        core_cool: leave the bottom row free (advect_wi_gaia.py:624-625).

    Returns:
        (T_new, dt): updated (..., H, W) temperature and the dt used.

    Reference: pytorch_networks_convae.py:522-568 (``ADNet.forward``).
    """
    u_int = u[..., 1:-1, 1:-1]
    v_int = v[..., 1:-1, 1:-1]

    dT_l = dx_left(T)[..., 1:-1, :]
    dT_r = dx_right(T)[..., 1:-1, :]
    dT_t = dy_top(T)[..., :, 1:-1]
    dT_b = dy_bot(T)[..., :, 1:-1]

    gx_l = dT_l / metrics.dx_l
    gx_r = dT_r / metrics.dx_r
    gy_t = dT_t / metrics.dy_t
    gy_b = dT_b / metrics.dy_b

    dT_dx = gx_l * (u_int > 0) + gx_r * (u_int < 0)
    dT_dy = gy_t * (v_int > 0) + gy_b * (v_int < 0)

    T_laplace = (gx_r - gx_l) / (0.5 * metrics.dx_r + 0.5 * metrics.dx_l) + (
        gy_b - gy_t
    ) / (0.5 * metrics.dy_b + 0.5 * metrics.dy_t)

    if dt is None:
        dt = stability_dt(u_int, v_int, metrics.dx_min, cn_max)

    T_int = T[..., 1:-1, 1:-1] + dt * (
        -u_int * dT_dx - v_int * dT_dy + T_laplace + raq_ra
    )

    T_new = replicate_pad(T_int, (1, 1, 1, 1))
    if not core_cool:
        T_new = T_new.at[..., 0, :].set(bottom_T)
    T_new = T_new.at[..., -1, :].set(top_T)
    return T_new, dt


def viscous_dissipation(u, v, V, metrics: GridMetrics):
    """EBA viscous-dissipation density Φ = τ:ε̇ on the grid interior.

    For incompressible flow Φ = 2η ε̇:ε̇
    = η [2(∂u/∂x)² + 2(∂v/∂y)² + (∂u/∂y + ∂v/∂x)²].
    The energy equation gains +(Di/Ra)·Φ under GAIA's
    MCEnergy=Boussinesq/Compress (prepare_gaia_ini.py:61-62); the
    reference fixes Ra=1 (prepare_gaia_ini.py:117) so the engine
    multiplies this by Di directly. Derivatives are centred differences
    over the one-sided metric pairs, matching the native engine's
    stencil exactly (native/gaia_engine.cpp, do_timestep_dt).

    Args:
        u, v, V: (..., H, W) velocities and viscosity (full grid).
    Returns:
        (..., H-2, W-2) dissipation density Φ on the interior.
    """
    dx_c = metrics.dx_l + metrics.dx_r    # x[c+1] - x[c-1]
    dy_c = metrics.dy_t + metrics.dy_b    # y[r+1] - y[r-1]
    du_dx = (u[..., 1:-1, 2:] - u[..., 1:-1, :-2]) / dx_c
    dv_dx = (v[..., 1:-1, 2:] - v[..., 1:-1, :-2]) / dx_c
    du_dy = (u[..., 2:, 1:-1] - u[..., :-2, 1:-1]) / dy_c
    dv_dy = (v[..., 2:, 1:-1] - v[..., :-2, 1:-1]) / dy_c
    shear = du_dy + dv_dx
    return V[..., 1:-1, 1:-1] * (
        2.0 * du_dx**2 + 2.0 * dv_dy**2 + shear**2)


def advect_diffuse_step_weno(
    u, v, T, raq_ra, dx: float = 1.0 / 126.0,
    dt: Optional[jnp.ndarray] = None, cn_max: float = 0.1,
):
    """Upwind step with uniform-dx metrics plus 4th-order hyperdiffusion.

    Port slot of the reference's ``ADNetWENO`` (ad_nets-checkpoint.py:25-147,
    header: "WENO has bugs; use upwind for now"): the reference's forward
    pass actually uses the first-order upwind fluxes with a 4th-derivative
    diffusion term; we reproduce that behaviour (not the dead WENO-weight
    helpers).
    """
    u_int = u[..., 1:-1, 1:-1]
    v_int = v[..., 1:-1, 1:-1]

    dT_l = dx_left(T)[..., 1:-1, :]
    dT_r = dx_right(T)[..., 1:-1, :]
    dT_t = dy_top(T)[..., :, 1:-1]
    dT_b = dy_bot(T)[..., :, 1:-1]

    flux_x = dT_l / dx * (u_int > 0) + dT_r / dx * (u_int < 0)
    flux_y = dT_t / dx * (v_int > 0) + dT_b / dx * (v_int < 0)

    # 4th-order diffusion: [1,-4,6,-4,1]/dx^4 along each axis on a
    # replicate-padded field (ad_nets-checkpoint.py:88-111).
    Tpx = replicate_pad(T, (2, 2, 0, 0))
    Tpy = replicate_pad(T, (0, 0, 2, 2))
    d4x = (
        Tpx[..., :, :-4] - 4 * Tpx[..., :, 1:-3] + 6 * Tpx[..., :, 2:-2]
        - 4 * Tpx[..., :, 3:-1] + Tpx[..., :, 4:]
    ) / dx**4
    d4y = (
        Tpy[..., :-4, :] - 4 * Tpy[..., 1:-3, :] + 6 * Tpy[..., 2:-2, :]
        - 4 * Tpy[..., 3:-1, :] + Tpy[..., 4:, :]
    ) / dx**4
    diffusion = (d4x + d4y)[..., 1:-1, 1:-1]

    if dt is None:
        uv_mag = jnp.maximum(jnp.max(jnp.abs(u_int)), jnp.max(jnp.abs(v_int)))
        dt_advect = 0.5 * cn_max * dx / uv_mag
        dt_diffuse = 0.5 * (dx * dx) ** 2 / (dx**2 + dx**2)
        dt = jnp.minimum(dt_advect, dt_diffuse)

    T_int = T[..., 1:-1, 1:-1] - dt * (u_int * flux_x + v_int * flux_y) + dt * (
        diffusion + raq_ra
    )
    T_new = replicate_pad(T_int, (1, 1, 1, 1))
    T_new = T_new.at[..., 0, :].set(1.0)
    T_new = T_new.at[..., -1, :].set(0.0)
    return T_new, dt

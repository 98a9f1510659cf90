"""Pallas TPU kernels for the hot rollout ops.

The coupled rollout's non-surrogate work — upwind advection + diffusion +
source + BC stamping — is a chain of elementwise stencils over the whole
field. XLA fuses most of it; this kernel fuses *all* of it (including the
metric divisions and temperature clipping) into one VMEM-resident pass so
the energy update costs a single HBM round trip.

Grids up to ~1024² (f32) fit whole-field in VMEM; larger fields fall back
to the XLA implementation (physics/advection.py). On non-TPU backends the
kernel runs in interpreter mode (tests).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..physics.advection import GridMetrics


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _advect_kernel(u_ref, v_ref, T_ref, srcdt_ref,
                   dxl_ref, dxr_ref, dyt_ref, dyb_ref,
                   out_ref, *, bottom_T, top_T, core_cool, clip_T):
    """Fused energy update on one (H, W) field.

    srcdt_ref: (1, 2) SMEM scalars [raq_ra, dt].
    The metric refs hold the interior (H-2, W-2) one-sided spacings.
    """
    T = T_ref[:]
    H, W = T.shape
    u = u_ref[1:H - 1, 1:W - 1]
    v = v_ref[1:H - 1, 1:W - 1]
    src = srcdt_ref[0, 0]
    dt = srcdt_ref[0, 1]

    Tc = T[1:H - 1, 1:W - 1]
    gl = (Tc - T[1:H - 1, 0:W - 2]) / dxl_ref[:]
    gr = (T[1:H - 1, 2:W] - Tc) / dxr_ref[:]
    gt = (Tc - T[0:H - 2, 1:W - 1]) / dyt_ref[:]
    gb = (T[2:H, 1:W - 1] - Tc) / dyb_ref[:]

    dT_dx = jnp.where(u > 0, gl, jnp.where(u < 0, gr, 0.0))
    dT_dy = jnp.where(v > 0, gt, jnp.where(v < 0, gb, 0.0))
    lap = (gr - gl) / (0.5 * (dxl_ref[:] + dxr_ref[:])) + \
          (gb - gt) / (0.5 * (dyt_ref[:] + dyb_ref[:]))

    Tn = Tc + dt * (-u * dT_dx - v * dT_dy + lap + src)
    if clip_T:
        Tn = jnp.clip(Tn, 0.0, 2.0)

    # replicate-pad + Dirichlet top/bottom + Neumann sides, fused.
    row_b = Tn[0:1, :]
    row_t = Tn[-1:, :]
    if not core_cool:
        row_b = jnp.full_like(row_b, bottom_T)
    row_t = jnp.full_like(row_t, top_T)
    body = jnp.concatenate([row_b, Tn, row_t], axis=0)       # (H, W-2)
    out = jnp.concatenate([body[:, 0:1], body, body[:, -1:]], axis=1)
    out_ref[:] = out


def advect_diffuse_step_pallas(
    u, v, T, raq_ra, metrics: GridMetrics,
    dt: Optional[jnp.ndarray] = None, cn_max: float = 0.1,
    bottom_T: float = 1.0, top_T: float = 0.0, core_cool: bool = False,
    clip_T: bool = False,
):
    """Drop-in replacement for physics.advection.advect_diffuse_step with
    the update body in one Pallas kernel. Fields (B, H, W) or (H, W).

    The adaptive dt (a pair of global reductions) stays in XLA — it is one
    fused reduction and feeding it through SMEM keeps the kernel simple.
    """
    squeeze = T.ndim == 2
    if squeeze:
        u, v, T = u[None], v[None], T[None]

    if dt is None:
        u_int = u[..., 1:-1, 1:-1]
        v_int = v[..., 1:-1, 1:-1]
        uv_mag = jnp.maximum(jnp.max(jnp.abs(u_int)),
                             jnp.max(jnp.abs(v_int)))
        dx_min = metrics.dx_min
        dt_advect = 0.5 * cn_max * dx_min / uv_mag
        dt_diffuse = 0.5 * (dx_min * dx_min) ** 2 / (2.0 * dx_min**2)
        dt = jnp.minimum(dt_advect, dt_diffuse)

    H, W = T.shape[-2], T.shape[-1]
    srcdt = jnp.stack([jnp.asarray(raq_ra, T.dtype).reshape(()),
                       jnp.asarray(dt, T.dtype).reshape(())]).reshape(1, 2)

    kernel = functools.partial(
        _advect_kernel, bottom_T=bottom_T, top_T=top_T,
        core_cool=core_cool, clip_T=clip_T)

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((H, W), T.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # u
            pl.BlockSpec(memory_space=pltpu.VMEM),  # v
            pl.BlockSpec(memory_space=pltpu.VMEM),  # T
            pl.BlockSpec(memory_space=pltpu.SMEM),  # src, dt
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dx_l
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dx_r
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dy_t
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dy_b
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )

    def one(ub, vb, Tb):
        return call(ub, vb, Tb, srcdt, metrics.dx_l, metrics.dx_r,
                    metrics.dy_t, metrics.dy_b)

    T_new = jax.vmap(one)(u, v, T)
    if squeeze:
        T_new = T_new[0]
    return T_new, dt


def fits_in_vmem(H: int, W: int, dtype=jnp.float32,
                 budget_bytes: int = 12 * 1024 * 1024) -> bool:
    """Conservative whole-field VMEM check (~8 live (H, W) buffers)."""
    return 8 * H * W * jnp.dtype(dtype).itemsize < budget_bytes

"""Pallas TPU kernels for the hot rollout ops.

The coupled rollout's non-surrogate work — upwind advection + diffusion +
source + BC stamping — is a chain of elementwise stencils over the whole
field. XLA fuses most of it; this kernel fuses *all* of it (including the
metric divisions, boundary replication and temperature clipping) into one
VMEM-resident pass so the energy update costs a single HBM round trip.

Implementation notes: neighbour access is expressed with ``pltpu.roll``
plus index masks (Mosaic's vector concatenate lowering rejects mixed-offset
concats, so no pad/concat is used); the boundary metric arrays are padded
to the full grid with ones to avoid div-by-zero in the rolled-in lanes that
the masks discard.

Grids up to ~1024² (f32) fit whole-field in VMEM; larger fields fall back
to the XLA implementation (physics/advection.py). On non-TPU backends the
kernel runs in interpreter mode (tests).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..physics.advection import GridMetrics


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _roll(x, shift, axis):
    if _interpret():
        return jnp.roll(x, shift, axis)
    if shift < 0:
        shift += x.shape[axis]  # pltpu.roll requires non-negative shifts
    return pltpu.roll(x, shift, axis)


def _advect_kernel(u_ref, v_ref, T_ref, srcdt_ref,
                   dxl_ref, dxr_ref, dyt_ref, dyb_ref,
                   out_ref, *, bottom_T, top_T, core_cool, clip_T):
    """Fused energy update on one (H, W) field.

    srcdt_ref: (1, 2) SMEM scalars [raq_ra, dt]. Metric refs are FULL
    (H, W) one-sided spacings (edge entries padded with 1).
    """
    T = T_ref[:]
    H, W = T.shape
    u = u_ref[:]
    v = v_ref[:]
    src = srcdt_ref[0, 0]
    dt = srcdt_ref[0, 1]

    # neighbour shifts (circular; wrapped lanes masked out below)
    T_l = _roll(T, 1, 1)     # T(i, j-1)
    T_r = _roll(T, -1, 1)    # T(i, j+1)
    T_t = _roll(T, 1, 0)     # T(i-1, j)
    T_b = _roll(T, -1, 0)    # T(i+1, j)

    gl = (T - T_l) / dxl_ref[:]
    gr = (T_r - T) / dxr_ref[:]
    gt = (T - T_t) / dyt_ref[:]
    gb = (T_b - T) / dyb_ref[:]

    dT_dx = jnp.where(u > 0, gl, jnp.where(u < 0, gr, 0.0))
    dT_dy = jnp.where(v > 0, gt, jnp.where(v < 0, gb, 0.0))
    lap = (gr - gl) / (0.5 * (dxl_ref[:] + dxr_ref[:])) + \
          (gb - gt) / (0.5 * (dyt_ref[:] + dyb_ref[:]))

    Tn = T + dt * (-u * dT_dx - v * dT_dy + lap + src)
    if clip_T:
        Tn = jnp.clip(Tn, 0.0, 2.0)

    rows = lax.broadcasted_iota(jnp.int32, (H, W), 0)
    cols = lax.broadcasted_iota(jnp.int32, (H, W), 1)
    interior = ((rows > 0) & (rows < H - 1) & (cols > 0) & (cols < W - 1))
    y = jnp.where(interior, Tn, T)

    # replicate sidewalls: col 0 ← col 1, col W-1 ← col W-2
    y = jnp.where(cols == 0, _roll(y, -1, 1), y)
    y = jnp.where(cols == W - 1, _roll(y, 1, 1), y)
    # Dirichlet plates (bottom replicates under core cooling)
    if core_cool:
        y = jnp.where(rows == 0, _roll(y, -1, 0), y)
    else:
        y = jnp.where(rows == 0, jnp.asarray(bottom_T, y.dtype), y)
    y = jnp.where(rows == H - 1, jnp.asarray(top_T, y.dtype), y)
    out_ref[:] = y


def _full_metrics(metrics: GridMetrics, H: int, W: int, dtype):
    """Pad the interior (H-2, W-2) metric arrays to (H, W) with ones."""
    def pad(a):
        return jnp.pad(a.astype(dtype), ((1, 1), (1, 1)),
                       constant_values=1.0)
    return (pad(metrics.dx_l), pad(metrics.dx_r),
            pad(metrics.dy_t), pad(metrics.dy_b))


def advect_diffuse_step_pallas(
    u, v, T, raq_ra, metrics: GridMetrics,
    dt: Optional[jnp.ndarray] = None, cn_max: float = 0.1,
    bottom_T: float = 1.0, top_T: float = 0.0, core_cool: bool = False,
    clip_T: bool = False,
):
    """Drop-in replacement for physics.advection.advect_diffuse_step with
    the update body in one Pallas kernel. Fields (B, H, W) or (H, W).

    Restriction: ``raq_ra`` must be scalar (the engine's field sources —
    EBA Di terms — use the XLA path). The adaptive dt (a pair of global
    reductions) stays in XLA and feeds the kernel via SMEM.
    """
    if jnp.ndim(raq_ra) != 0:
        from ..physics.advection import advect_diffuse_step
        T_new, dt = advect_diffuse_step(
            u, v, T, raq_ra, metrics, dt=dt, cn_max=cn_max,
            bottom_T=bottom_T, top_T=top_T, core_cool=core_cool)
        if clip_T:
            T_new = jnp.clip(T_new, 0.0, 2.0)
        return T_new, dt

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
    dxl, dxr, dyt, dyb = _full_metrics(metrics, H, W, T.dtype)

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
        return call(ub, vb, Tb, srcdt, dxl, dxr, dyt, dyb)

    T_new = jax.vmap(one)(u, v, T)
    if squeeze:
        T_new = T_new[0]
    return T_new, dt


def fits_in_vmem(H: int, W: int, dtype=jnp.float32,
                 budget_bytes: int = 12 * 1024 * 1024) -> bool:
    """Conservative whole-field VMEM check (~8 live (H, W) buffers)."""
    return 8 * H * W * jnp.dtype(dtype).itemsize < budget_bytes

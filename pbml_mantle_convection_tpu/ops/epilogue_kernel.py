"""Fused rollout epilogue: curl head + advection–diffusion in one kernel.

The shipped megakernel rollout spends ~0.09 ms/step (≈10%) in the XLA
glue after the merge-3 kernel: stream-function d2s + spatial-mean
subtraction + the curl head (ops/curl.py:curl_head_padded) + velocity
unscaling + the explicit upwind energy step (physics/advection.py:
advect_diffuse_step) + temperature BC stamping/clipping (PERF.md
round-2 closing attribution: advection 0.035, copies 0.036,
curl/assembly 0.018). This module fuses everything after the d2s into
ONE small Pallas kernel over the dense (H, W) fields — pure VPU work on
sub-MB arrays that XLA otherwise splits across several fusions with
full HBM round-trips between them.

Analytic simplification used (documented deviation at the f32
reassociation level): the reference subtracts the spatial mean from the
network output before the curl head (pytorch_networks_convae.py:1343,
:1357), but with a *scalar* ``a_bound`` the mean cancels exactly in the
central differences — d/dx[(y − m)·c] = c·dy/dx — so the kernel derives
(u, v) directly from stream-function differences. Bitwise this
reassociates two f32 subtractions (|Δ| ~1e-7 relative, measured by the
exactness test); on TPU the shipped path's default-bf16 conv noise
(~1e-3, PARITY.md) dominates by four orders of magnitude.

Reproduced semantics, in order (reference: pytorch_networks_convae.py:
1356-1388 curl head; :522-568 ADNet; advect_wi_gaia.py:624-629 BCs):

* u = ∂(a·a_bound)/∂y, v = −∂(a·a_bound)/∂x as VALID central diffs;
* replicate-pad to (H, W); u sidewalls antisymmetric, v top/bottom
  antisymmetric; corners zeroed;
* scale by the velocity scaler;
* metric-aware upwind advection + conservative Laplacian + source,
  adaptive dt = min(0.5·cn_max·dx_min/|uv|_max, 0.25·dx_min²);
* explicit Euler update, replicate pad, bottom T=1 / top T=0 Dirichlet,
  Neumann (copy) sidewalls, clip to [0, 2]
  (sim/engine.py:step ordering).

Applies when: B=1, f32, scalar heating source (radioactive decay fine —
it is a traced scalar), Di=0, core_cool=False, curl head without blur,
no pressure output. ``sim/engine.SimEngine`` gates and falls back to
the XLA composition otherwise (or when PMC_NO_FUSED_EPILOGUE=1).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

# All ~11 (H, W) f32 operands of the single-block kernel must fit one
# VMEM block (~16 MB/core): 11 · 4 B · H·W ≤ ~12 MB ⇒ bound H·W.
# sim/engine.py gates on this and falls back to the XLA composition for
# larger grids instead of failing to compile.
FUSED_MAX_HW = 256 * 1024


def _epilogue_kernel(dxl_ref, dxr_ref, dyt_ref, dyb_ref, psi_ref, t_ref,
                     s_ref, src_ref, u_ref, v_ref, tn_ref, dt_ref, *,
                     H, W, a_bound, cn_max, dx_min, dt_diffuse):
    f32 = psi_ref.dtype

    # ---- curl head from stream-function differences (mean cancels) ----
    c = jnp.asarray(a_bound, f32)
    s = s_ref[...]                                   # (1, 1) scaler
    u0 = (0.5 * c) * (psi_ref[2:, 1:-1] - psi_ref[:-2, 1:-1])  # (H-2, W-2)
    v0 = (-0.5 * c) * (psi_ref[1:-1, 2:] - psi_ref[1:-1, :-2])

    # interior velocities (BC edits only touch the boundary ring)
    u_int = u0 * s
    v_int = v0 * s

    # full-field assembly: replicate pad + antisymmetric BCs + corners
    urow = jnp.concatenate([u0[:1], u0, u0[-1:]], axis=0)      # (H, W-2)
    u = jnp.concatenate([-urow[:, :1], urow, -urow[:, -1:]], axis=1)
    vcol = jnp.concatenate([v0[:, :1], v0, v0[:, -1:]], axis=1)  # (H-2, W)
    v = jnp.concatenate([-vcol[:1], vcol, -vcol[-1:]], axis=0)

    riota = lax.broadcasted_iota(jnp.int32, (H, W), 0)
    ciota = lax.broadcasted_iota(jnp.int32, (H, W), 1)
    edge_r = (riota == 0) | (riota == H - 1)
    edge_c = (ciota == 0) | (ciota == W - 1)
    corner = edge_r & edge_c
    zero = jnp.zeros((), f32)
    u_ref[...] = jnp.where(corner, zero, u * s)
    v_ref[...] = jnp.where(corner, zero, v * s)

    # ---- upwind advection–diffusion (physics/advection.py) ----
    tc = t_ref[1:-1, 1:-1]                                     # (H-2, W-2)
    gx_l = (tc - t_ref[1:-1, :-2]) / dxl_ref[...]
    gx_r = (t_ref[1:-1, 2:] - tc) / dxr_ref[...]
    gy_t = (tc - t_ref[:-2, 1:-1]) / dyt_ref[...]
    gy_b = (t_ref[2:, 1:-1] - tc) / dyb_ref[...]

    dT_dx = (jnp.where(u_int > 0, gx_l, zero)
             + jnp.where(u_int < 0, gx_r, zero))
    dT_dy = (jnp.where(v_int > 0, gy_t, zero)
             + jnp.where(v_int < 0, gy_b, zero))
    t_lap = ((gx_r - gx_l) / (0.5 * dxr_ref[...] + 0.5 * dxl_ref[...])
             + (gy_b - gy_t) / (0.5 * dyb_ref[...] + 0.5 * dyt_ref[...]))

    # adaptive dt: two-stage keepdims reductions (rank-0 reduces do not
    # lower on all Mosaic versions)
    mag = jnp.maximum(jnp.abs(u_int), jnp.abs(v_int))
    uv_mag = jnp.max(jnp.max(mag, axis=1, keepdims=True),
                     axis=0, keepdims=True)                    # (1, 1)
    dt_adv = (0.5 * cn_max * dx_min) / uv_mag
    dt = jnp.minimum(dt_adv, jnp.asarray(dt_diffuse, f32))     # (1, 1)
    dt_ref[...] = dt

    ti = tc + dt * (-u_int * dT_dx - v_int * dT_dy + t_lap
                    + src_ref[...])
    trow = jnp.concatenate([ti[:1], ti, ti[-1:]], axis=0)      # (H, W-2)
    tn = jnp.concatenate([trow[:, :1], trow, trow[:, -1:]], axis=1)
    one = jnp.ones((), f32)
    tn = jnp.where(riota == 0, one, tn)
    tn = jnp.where(riota == H - 1, zero, tn)
    tn_ref[...] = jnp.clip(tn, 0.0, 2.0)


class CurlAdvectEpilogue:
    """Compiled fused epilogue (see module docstring).

    ``__call__(psi, T, scaler, src)``: psi/T are (H, W) f32 (psi is the
    merge-3 stream-function output BEFORE mean subtraction), scaler and
    src traced scalars. Returns (u, v, T_new, dt) — u/v/T_new (H, W),
    dt a scalar.
    """

    def __init__(self, metrics, H: int, W: int, a_bound: float,
                 cn_max: float, dtype=jnp.float32,
                 interpret: bool = False):
        dxl = np.asarray(metrics.dx_l, dtype)
        dxr = np.asarray(metrics.dx_r, dtype)
        dyt = np.asarray(metrics.dy_t, dtype)
        dyb = np.asarray(metrics.dy_b, dtype)
        assert dxl.shape == (H - 2, W - 2), (dxl.shape, H, W)
        dx_min = np.float32(dxl.min())
        # 0.5·(dx²)²/(dx²+dx²), evaluated host-side with the same f32
        # ops as physics/advection.py:stability_dt
        dx2 = np.float32(dx_min * dx_min)
        dt_diffuse = np.float32(0.5) * (dx2 * dx2) / (dx2 + dx2)

        kern = functools.partial(
            _epilogue_kernel, H=H, W=W, a_bound=float(a_bound),
            cn_max=float(cn_max), dx_min=float(dx_min),
            dt_diffuse=float(dt_diffuse))
        self._call = pl.pallas_call(
            kern,
            out_shape=(
                jax.ShapeDtypeStruct((H, W), dtype),   # u
                jax.ShapeDtypeStruct((H, W), dtype),   # v
                jax.ShapeDtypeStruct((H, W), dtype),   # T_new
                jax.ShapeDtypeStruct((1, 1), dtype),   # dt
            ),
            interpret=interpret,
        )
        # Kept as NUMPY arrays on purpose: converting with jnp.asarray
        # here would bake the conversion into whichever trace first
        # builds the kernel, and caching those tracers across traces is
        # exactly the UnexpectedTracerError that killed BENCH_r03
        # (bench.py warmup n=20 then timed n=500 retrace). Numpy
        # constants are embedded fresh into every trace.
        self._consts = (dxl, dxr, dyt, dyb)
        self.dtype = dtype

    def __call__(self, psi, T, scaler, src):
        d = self.dtype
        s = jnp.broadcast_to(jnp.asarray(scaler, d), (1, 1))
        sr = jnp.broadcast_to(jnp.asarray(src, d), (1, 1))
        consts = tuple(jnp.asarray(c) for c in self._consts)
        u, v, tn, dt = self._call(*consts, psi.astype(d),
                                  T.astype(d), s, sr)
        return u, v, tn, dt[0, 0]

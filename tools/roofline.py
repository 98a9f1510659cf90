"""Speed-of-light / roofline analysis of the shipped megakernel step.

Answers "how far is the measured step time from the hardware limit?"
using the ACTUAL built kernel stacks (no hand-copied shape math):

* **HBM bytes/step** — exact: the nbytes of every kernel's streamed
  constants (bf16 conv/band weights, f32 GN/assembly matrices — the
  `_consts` tuples that are pallas_call operands every step) plus the
  activation traffic (each kernel's HBM input/output buffers).
* **MXU dot FLOPs/step** — the main-conv, band and trunk-piece dot
  general shapes plus the in-kernel bicubic matmuls; GroupNorm-stat,
  pool and assembly dots are small and noted, not counted (the figure
  is a slight lower bound).

The two lower bounds t_hbm = bytes/BW and t_mxu = flops/peak give the
speed-of-light step time max(t_hbm, t_mxu); utilization = SoL/measured.

Usage::

    python tools/roofline.py [H W measured_ms]

Defaults: 256 256 0.825 (PERF.md round-4 packed-band-slot figure).
Peaks default to TPU v5e (197 TFLOP/s bf16, 819 GB/s HBM); override
with PMC_PEAK_TFLOPS / PMC_PEAK_GBS.

Reference for the step composition this analyzes: the 7-kernel
megakernel executor (models/fast_path.py, ops/branch_kernel.py,
ops/merge_kernel.py) + fused curl/advection epilogue
(ops/epilogue_kernel.py, counted in activation traffic only).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def stack_stats(st, label):
    """(flops, const_bytes, act_bytes) for one LayerStack."""
    wmain = st._consts[0]                   # (R, 3, 3, C, C)
    wband = st._consts[1]
    R, _, _, C, Co = wmain.shape
    hr, wc = st._hr, st._wc
    # main conv: 9 shifted taps, M = hr*wc interior blocks
    flops = R * 9 * 2 * hr * wc * C * Co
    # bands: every edge re-evaluates the 9-tap structure on its strip
    # (2 row bands of M=wc, 2 col bands of M=hr, 4 corners of M=1);
    # packing shares streamed matrices, not evaluations
    if wband.ndim == 6:
        flops += R * 9 * 2 * (2 * wc + 2 * hr + 4) * C * Co
    const_b = sum(np.asarray(c).nbytes for c in st._consts)
    if st._pool_consts:
        const_b += sum(np.asarray(c).nbytes for c in st._pool_consts)
    itemsize = 4  # f32 activations
    act_b = (hr + 2) * (wc + 2) * C * itemsize        # read x
    act_b += (hr + 2) * (wc + 2) * Co * itemsize      # write y
    if st.pool:
        act_b += (hr // 2 + 2) * (wc // 2 + 2) * Co * itemsize
    return flops, const_b, act_b


def trunk_stats(tk):
    """(flops, const_bytes, act_bytes) for the TrunkStack."""
    wmain = tk._consts[0]                   # (npieces, 3, 3, C, fco)
    npieces, _, _, C, fco = wmain.shape
    hr, wc = tk._grids[0]
    flops = npieces * 9 * 2 * hr * wc * C * fco
    flops += npieces * 9 * 2 * (2 * wc + 2 * hr + 4) * C * fco
    # in-kernel bicubic: per coarse level, parity-split Keys matmuls
    # over rows then cols of the (hrl, wcl, C) piece
    for (hrl, wcl) in tk._grids[1:]:
        flops += 2 * 4 * hr * hrl * wcl * C      # row resize (4 parities)
        flops += 2 * 16 * wc * wcl * hr * C      # col resize (16 parities)
    const_b = sum(np.asarray(c).nbytes for c in tk._consts)
    itemsize = 4
    act_b = sum((g[0] + 2) * (g[1] + 2) * 128 * itemsize
                for g in [tk._grids[0]] + list(tk._grids))  # pieces in
    act_b += (hr + 2) * (wc + 2) * fco * itemsize           # out
    return flops, const_b, act_b


def main(H=256, W=256, measured_ms=0.825):
    from pbml_mantle_convection_tpu.models import NewFluidNet
    from pbml_mantle_convection_tpu.models.fast_path import FastNewFluidNet

    jax.config.update("jax_platforms", "cpu")
    model = NewFluidNet(levels=5, c_i=7, c_h=16, c_o=1, act_fn="gelu",
                        r_p="learned", loss_type="curl", repeats=6, f=5,
                        p_pred=False, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, H, W, 7), jnp.float32))
    # mk_tpu_numerics: bf16 weight storage — the TPU byte footprint
    fast = FastNewFluidNet(model, params, H, W, megakernel=True,
                           mk_tpu_numerics=True)
    fast._build_megakernel()

    rows = []
    tot_f = tot_cb = tot_ab = 0
    stacks = ([("stem", fast.mk_stem)]
              + [(f"branch{l}", s) for l, s in enumerate(fast.mk_branches)]
              + [("merge2", fast.mkm2), ("merge3", fast.mkm3)])
    for label, st in stacks:
        f, cb, ab = stack_stats(st, label)
        rows.append((label, f, cb, ab))
        tot_f += f; tot_cb += cb; tot_ab += ab
    f, cb, ab = trunk_stats(fast.mkm1)
    rows.append(("trunk(m1+resize)", f, cb, ab))
    tot_f += f; tot_cb += cb; tot_ab += ab

    # epilogue / advection: no streamed weights; T,psi,u,v,T' traffic
    tot_ab += 6 * H * W * 4

    peak_tf = float(os.environ.get("PMC_PEAK_TFLOPS", "197")) * 1e12
    peak_bw = float(os.environ.get("PMC_PEAK_GBS", "819")) * 1e9

    t_mxu = tot_f / peak_tf * 1e3
    t_hbm = (tot_cb + tot_ab) / peak_bw * 1e3
    sol = max(t_mxu, t_hbm)
    # tighter bound honoring the 9-launch serialization: each kernel
    # is individually bounded by max(its compute, its bytes) — the deep
    # branches are weight-streaming-bound (10.9 MB of consts against
    # <0.4 GFLOP), which the flat totals above average away
    sol_serial = sum(
        max(f / peak_tf, (cb + ab) / peak_bw) * 1e3
        for _, f, cb, ab in rows)

    print(f"{'kernel':<18}{'GFLOP':>9}{'const MB':>10}{'act MB':>9}")
    for label, f, cb, ab in rows:
        print(f"{label:<18}{f / 1e9:9.3f}{cb / 1e6:10.2f}{ab / 1e6:9.2f}")
    print(f"{'TOTAL':<18}{tot_f / 1e9:9.3f}{tot_cb / 1e6:10.2f}"
          f"{tot_ab / 1e6:9.2f}")
    print(json.dumps({
        "grid": f"{H}x{W}",
        "gflop_per_step": round(tot_f / 1e9, 3),
        "hbm_mb_per_step": round((tot_cb + tot_ab) / 1e6, 2),
        "t_mxu_ms": round(t_mxu, 4),
        "t_hbm_ms": round(t_hbm, 4),
        "speed_of_light_ms": round(sol, 4),
        "sol_serial_ms": round(sol_serial, 4),
        "measured_ms": measured_ms,
        "sol_fraction": round(sol / measured_ms, 3),
        "mxu_util": round(t_mxu / measured_ms, 3),
        "hbm_util": round(t_hbm / measured_ms, 3),
    }))


if __name__ == "__main__":
    a = sys.argv[1:]
    main(int(a[0]) if a else 256, int(a[1]) if len(a) > 1 else 256,
         float(a[2]) if len(a) > 2 else 0.825)

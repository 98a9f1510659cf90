"""Roofline + attribution for the DP train step (VERDICT r4 next-4).

Where the megakernel roofline (tools/roofline.py) hand-counts the built
kernel stacks, the train step is a single XLA program — so this tool asks
the compiler itself: ``compiled.cost_analysis()`` gives the program's
flops and bytes accessed, from which the two lower bounds

    t_mxu = flops / peak_flops        t_hbm = bytes / peak_bw

give speed-of-light = max(t_mxu, t_hbm) and utilization = SoL/measured.

It also attributes the measured step: the eval step (forward + loss), the
value_and_grad program (forward + backward), and the full train step
(+ Adam update) are timed separately on the same resident batch, so the
fwd / bwd / update split is measured, not inferred.

The flagship config matches ``pmc-benchmark --what train``: NewFluidNet
levels=5 c_h=16 r6 k5 curl, batch 8 at the production 128x506 grid
(reference: multigpu.py:307-338, its per-batch `_run_batch`).

Peaks default to TPU v5e: 197 TFLOP/s bf16 / 98.5 TFLOP/s f32 (the train
step's convs are f32 — the f32 peak is the honest denominator), 819 GB/s
HBM; override with PMC_PEAK_TFLOPS_F32 / PMC_PEAK_GBS.

Usage: python tools/train_roofline.py [--iters 200] [--batch 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timed(fn, args, n, ready):
    out = fn(*args)
    ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--H", type=int, default=128)
    ap.add_argument("--W", type=int, default=506)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from pbml_mantle_convection_tpu.models.registry import (
        ModelConfig, build_model)
    from pbml_mantle_convection_tpu.train.train_step import (
        TrainStepConfig, make_loss_fn, make_train_step)
    from pbml_mantle_convection_tpu.utils.jit import (
        enable_compilation_cache)

    enable_compilation_cache()
    B, H, W = args.batch, args.H, args.W
    mc = ModelConfig(network="newfluidnet", levels=5, c_h=16, repeats=6,
                     kernel=5, r_p="learned", loss_type="curl",
                     p_pred=False, H=H, W=W)
    model = build_model(mc)
    c_i, _ = mc.channels
    rs = np.random.default_rng(0)
    x = jnp.asarray(rs.normal(size=(B, H, W, c_i)), jnp.float32)
    y = jnp.asarray(rs.normal(size=(B, 2, H, W)), jnp.float32)
    batch = {"x": x, "y": y}
    params = model.init(jax.random.PRNGKey(0), x[:1])
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    cfg = TrainStepConfig(net="newfluidnet", loss_scale=True,
                          loss_derivative=True, loss_type="curl")
    loss_fn = make_loss_fn(model.apply, cfg)
    step = make_train_step(model.apply, opt, cfg)

    fwd = jax.jit(lambda p, b: loss_fn(p, b)[0])
    vjp = jax.jit(lambda p, b: jax.value_and_grad(
        lambda pp: loss_fn(pp, b)[0])(p))

    # ---- XLA cost analysis of the full train step --------------------
    lowered = step.lower(params, opt_state, batch)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):    # older jax returns [dict]
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    bytes_ = float(ca.get("bytes accessed", 0.0))

    peak_tf = float(os.environ.get("PMC_PEAK_TFLOPS_F32", "98.5")) * 1e12
    peak_bw = float(os.environ.get("PMC_PEAK_GBS", "819")) * 1e9
    t_mxu = flops / peak_tf * 1e3
    t_hbm = bytes_ / peak_bw * 1e3
    sol = max(t_mxu, t_hbm)

    # ---- measured attribution ----------------------------------------
    n = args.iters
    ready = lambda o: jax.block_until_ready(jax.tree.leaves(o)[0])
    ms_fwd = timed(fwd, (params, batch), n, ready)
    ms_vjp = timed(vjp, (params, batch), n, ready)
    # full step: params/opt_state must evolve so every dispatch is unique
    # (the axon relay dedupes identical dispatches, PERF.md)
    pp, oo, br = step(params, opt_state, batch)
    ready(br.total)
    t0 = time.perf_counter()
    for _ in range(n):
        pp, oo, br = step(pp, oo, batch)
    ready(br.total)
    ms_step = (time.perf_counter() - t0) / n * 1e3

    out = {
        "backend": jax.default_backend(),
        "config": f"newfluidnet l5 c16 r6 k5 curl B{B} {H}x{W}",
        "xla_gflop": round(flops / 1e9, 2),
        "xla_mb_accessed": round(bytes_ / 1e6, 1),
        "t_mxu_ms": round(t_mxu, 4),
        "t_hbm_ms": round(t_hbm, 4),
        "speed_of_light_ms": round(sol, 4),
        "measured_fwd_ms": round(ms_fwd, 4),
        "measured_fwd_bwd_ms": round(ms_vjp, 4),
        "measured_step_ms": round(ms_step, 4),
        "bwd_over_fwd": round((ms_vjp - ms_fwd) / ms_fwd, 2),
        "update_ms": round(ms_step - ms_vjp, 4),
        "sol_fraction": round(sol / ms_step, 3),
        "mxu_util": round(t_mxu / ms_step, 3),
        "hbm_util": round(t_hbm / ms_step, 3),
    }
    print(json.dumps(out, indent=1))
    return out


if __name__ == "__main__":
    main()

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


def timed_chain(fn, params, batch, n, ready):
    """Time ``fn(params, batch)`` over a dependency chain of UNIQUE
    dispatches: each iteration multiplies batch['x'] by (1 + 1e-7) AND
    mixes in the previous loss, so successive dispatches differ in
    CONTENT (the axon relay dedupes on content, not object identity —
    an additive epsilon that rounds away is not enough) and form a true
    dependency chain. The added elementwise update costs ~2 passes over
    x (~35 us at B=8) — negligible against the ms-scale programs timed
    here. The 1e-7 drift changes the loss in the 6th digit over 100
    iters; timing is unaffected."""
    import jax
    import jax.numpy as jnp

    def chained(params, batch):
        out = fn(params, batch)
        loss = out[0] if isinstance(out, tuple) else out
        x = batch["x"] * jnp.float32(1.0 + 1e-7) + jnp.float32(1e-30) * loss
        return out, dict(batch, x=x)

    chained = jax.jit(chained)
    out, b = chained(params, batch)
    ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out, b = chained(params, b)
    ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def device_ms_per_step(trace_dir, steps):
    """Sum device-pid op durations from the newest profiler trace."""
    import collections
    import glob
    import gzip
    import json as _json

    tracefile = sorted(glob.glob(
        f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(tracefile) as f:
        data = _json.load(f)
    dev_pid = None
    for e in data["traceEvents"]:
        if (e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e["args"].get("name"))):
            dev_pid = e["pid"]
    # The trace nests events (module > fusion > op) on each device tid;
    # summing every X event double-counts parents. Keep only LEAF events:
    # an event is a parent if another event on the same tid starts within
    # its [ts, ts+dur) span.
    import re
    by_tid = collections.defaultdict(list)
    for e in data["traceEvents"]:
        if e.get("ph") == "X" and e.get("pid") == dev_pid:
            by_tid[e.get("tid")].append(e)
    tot = 0
    cat = collections.Counter()
    byname = collections.Counter()
    for tid, evs in by_tid.items():
        evs.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
        for i, e in enumerate(evs):
            ts, dur = e["ts"], e.get("dur", 0)
            # well-formed nesting: e is a parent iff the next event (by
            # start, ties broken longest-first) begins inside its span
            if (i + 1 < len(evs) and evs[i + 1]["ts"] < ts + dur
                    and evs[i + 1] is not e):
                continue
            tot += dur
            name = e.get("name", "")
            byname[name] += dur
            m = re.match(r"([a-zA-Z\-_]+)", name)
            cat[m.group(1) if m else "other"] += dur
    return (tot / steps / 1e3,
            {k: round(d / steps / 1e3, 4) for k, d in cat.most_common(8)},
            {k: round(d / steps / 1e3, 4)
             for k, d in byname.most_common(12)})


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
    t_mxu = flops / peak_tf * 1e3

    # ---- measured attribution ----------------------------------------
    n = args.iters
    ready = lambda o: jax.block_until_ready(jax.tree.leaves(o)[0])
    ms_fwd = timed_chain(fwd, params, batch, n, ready)
    ms_vjp = timed_chain(vjp, params, batch, n, ready)
    # full step: params/opt_state must evolve so every dispatch is unique
    # (the axon relay dedupes identical dispatches, PERF.md)
    pp, oo, br = step(params, opt_state, batch)
    ready(br.total)
    t0 = time.perf_counter()
    for _ in range(n):
        pp, oo, br = step(pp, oo, batch)
    ready(br.total)
    ms_step = (time.perf_counter() - t0) / n * 1e3

    # device-side ground truth for the full step: profiler trace over a
    # short unique-dispatch chain (wall-clock through the axon relay
    # carries dispatch latency; the trace carries only device ops)
    trace_dir = "/tmp/pmc_train_trace"
    n_prof = 20
    jax.profiler.start_trace(trace_dir)
    for _ in range(n_prof):
        pp, oo, br = step(pp, oo, batch)
    ready(br.total)
    jax.profiler.stop_trace()
    ms_dev, dev_cats, dev_ops = device_ms_per_step(trace_dir, n_prof)

    out = {
        "backend": jax.default_backend(),
        "config": f"newfluidnet l5 c16 r6 k5 curl B{B} {H}x{W}",
        # cost_analysis estimates: flops is the honest MXU-bound input;
        # "bytes accessed" counts every fusion operand at full size and
        # overcounts HBM traffic by >10x on this program — reported for
        # the record, NOT used as a bound.
        "xla_gflop": round(flops / 1e9, 2),
        "xla_mb_accessed_overcount": round(bytes_ / 1e6, 1),
        "t_mxu_ms": round(t_mxu, 4),
        "measured_fwd_ms": round(ms_fwd, 4),
        "measured_fwd_bwd_ms": round(ms_vjp, 4),
        "measured_step_ms": round(ms_step, 4),
        "device_step_ms": round(ms_dev, 4),
        "device_categories_ms": dev_cats,
        "device_top_ops_ms": dev_ops,
        "dispatch_overhead_ms": round(ms_step - ms_dev, 4),
        "bwd_over_fwd": round((ms_vjp - ms_fwd) / ms_fwd, 2),
        "update_ms": round(ms_step - ms_vjp, 4),
        "mxu_util_of_device": round(t_mxu / ms_dev, 3),
    }
    print(json.dumps(out, indent=1))
    return out


if __name__ == "__main__":
    main()

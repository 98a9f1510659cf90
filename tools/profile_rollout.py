"""Profile the coupled rollout on TPU and attribute device time to source.

Usage:  python tools/profile_rollout.py [H W steps] [--network unet]

Captures a jax.profiler trace of `SimEngine.multi_step`, dumps the
optimized HLO, joins trace op names to HLO source metadata, and prints a
per-source-line device-time table — the workflow that produced the PERF.md
attribution tables. Works through the axon remote-compile relay (the trace
contains real device-side op timings under pid "/device:TPU:0").
"""

import collections
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def main(H=256, W=256, steps=20, trace_dir="/tmp/pmc_trace",
         network="newfluidnet"):
    from pbml_mantle_convection_tpu.constants import SimParams
    from pbml_mantle_convection_tpu.models.registry import (
        ModelConfig, build_model)
    from pbml_mantle_convection_tpu.models.fast_path import FastNewFluidNet
    from pbml_mantle_convection_tpu.sim.engine import SimEngine
    from pbml_mantle_convection_tpu.sim.grid import Grid
    from pbml_mantle_convection_tpu.sim.stepper import TimeStepper

    from pbml_mantle_convection_tpu.utils.jit import enable_compilation_cache
    enable_compilation_cache()
    grid = Grid(H=H, W=W, aspect=(W - 2) / (H - 2), dtype="float32")
    pp = SimParams(3.0, 1e8, 10.0)
    mc = ModelConfig(network=network, levels=5, c_h=16, repeats=6,
                     kernel=5, r_p="learned", loss_type="curl",
                     p_pred=False, H=H, W=W, dtype=jnp.float32)
    model = build_model(mc)
    c_i, _ = mc.channels
    w = model.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, H, W, c_i), jnp.float32))
    if network == "newfluidnet":
        apply_fn = FastNewFluidNet(model, w, H, W, f=4)
    else:
        apply_fn = lambda xx: model.apply(w, xx)
    stepper = TimeStepper(grid=grid, params=pp, apply_fn=apply_fn,
                          net=network, cn_max=0.99, dtype=jnp.float32)
    eng = SimEngine(grid=grid, params=pp, stepper=stepper,
                    dtype=jnp.float32)
    T0 = jnp.clip(1.0 - grid.yc, 0, 1).astype(jnp.float32)[None]
    s0 = eng.init_state(T0)
    from pbml_mantle_convection_tpu.utils.jit import tpu_jit
    multi = tpu_jit(eng.multi_step, static_argnums=1)

    s2, _ = multi(s0, steps)
    jax.block_until_ready(s2.T)
    jax.profiler.start_trace(trace_dir)
    s2, _ = multi(s0, steps)
    jax.block_until_ready(s2.T)
    jax.profiler.stop_trace()

    # source map from the optimized HLO
    txt = multi.lower(s0, steps).compile().as_text()
    src = {}
    pat = re.compile(
        r'%([\w.\-]+) = .*?source_file="([^"]+)" source_line=(\d+)')
    for line in txt.splitlines():
        m = pat.search(line)
        if m:
            src[m.group(1)] = (f"{m.group(2).split('/')[-1]}:"
                               f"{m.group(3)}")

    tracefile = sorted(glob.glob(
        f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(tracefile) as f:
        data = json.load(f)

    # find the device pid
    dev_pid = None
    for e in data["traceEvents"]:
        if (e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e["args"].get("name"))):
            dev_pid = e["pid"]
    agg = collections.Counter()
    cat = collections.Counter()
    byop = collections.Counter()
    for e in data["traceEvents"]:
        if e.get("ph") == "X" and e.get("pid") == dev_pid:
            name = e.get("name", "")
            if name.startswith("jit_") or name.startswith("while"):
                continue
            agg[src.get(name, "?" + name[:24])] += e.get("dur", 0)
            byop[name] += e.get("dur", 0)
            cat[re.match(r"([a-zA-Z\-_]+)", name).group(1)] += e.get(
                "dur", 0)

    tot = sum(agg.values())
    print(f"device total: {tot / steps / 1e3:.3f} ms/step")
    print("\nby op category (ms/step):")
    for k, d in cat.most_common(10):
        print(f"  {d / steps / 1e3:7.4f}  {k}")
    print("\nby source line (ms/step):")
    for k, d in agg.most_common(25):
        print(f"  {d / steps / 1e3:7.4f}  {k}")
    print("\nby op name (ms/step, top 25):")
    for k, d in byop.most_common(25):
        print(f"  {d / steps / 1e3:7.4f}  {k}  [{src.get(k, '?')}]")


if __name__ == "__main__":
    argv = sys.argv[1:]
    network = "newfluidnet"
    if "--network" in argv:
        i = argv.index("--network")
        network = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    args = [int(a) for a in argv[:3]]
    main(*args, network=network)

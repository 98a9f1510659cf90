"""ML-mode interleave fidelity: native COURANT energy step vs in-framework.

The reference's ML mode alternates ADNet temperature updates with GAIA's
own COURANT-stepped energy solve every ``intervene_TS`` steps
(advect_wi_gaia.py:618-635) — two *different* dt rules interleaved. The
in-framework path intentionally coincides with ML_STOKES because the
engine's energy step is the same implementation (sim/engine.py module
doc). This tool QUANTIFIES that design choice (VERDICT round-3 missing
item 3): it rolls out one study case three ways with the same surrogate
velocities,

  A. in-framework ML      — SimEngine, explicit AD energy step every
                            step (one lax.scan);
  B. native interleave    — the reference's actual ML semantics:
                            ``rollout_native(mode="ML", intervene_ts=N)``
                            drives the native C++ engine
                            (native/gaia_engine.cpp COURANT stepper)
                            every N-th step, the AD update in between;
  C. native every-step    — ``mode="ML_STOKES"`` against the native
                            energy step each step (bridge row),

and reports the mean-T trace RMSE of B and C against A (common-time
interpolation, utils/evaluation.compare_rollouts) plus dt statistics.
Record the rows in STUDY.md.

Usage:  python tools/interleave_fidelity.py [--layers 126 --ar 4]
        [--steps 400] [--intervene 10] [--weights CKPT]
CPU is fine (the native engine is host-side anyway):
        python tools/interleave_fidelity.py --device cpu --layers 30 \
            --ar 2 --steps 120
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--layers", type=int, default=126,
                   help="GAIA interior layers (126 -> 128x506 at AR 4)")
    p.add_argument("--ar", type=float, default=4.0)
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--intervene", type=int, default=10,
                   help="intervene_TS: native energy step every N steps")
    p.add_argument("--raq", type=float, default=3.0)
    p.add_argument("--fkt", type=float, default=1e7)
    p.add_argument("--fkp", type=float, default=10.0)
    p.add_argument("--levels", type=int, default=5)
    p.add_argument("--c_h", type=int, default=16)
    p.add_argument("--repeats", type=int, default=6)
    p.add_argument("--weights", type=str, default=None,
                   help="msgpack/orbax checkpoint of the surrogate "
                        "(default: fixed-seed random init)")
    p.add_argument("--device", choices=["default", "cpu"],
                   default="default")
    p.add_argument("--json", action="store_true")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from pbml_mantle_convection_tpu.constants import SimParams
    from pbml_mantle_convection_tpu.models import NewFluidNet
    from pbml_mantle_convection_tpu.models.fast_path import FastNewFluidNet
    from pbml_mantle_convection_tpu.sim.engine import SimEngine
    from pbml_mantle_convection_tpu.sim.gaia_native import Direct
    from pbml_mantle_convection_tpu.sim.grid import Grid
    from pbml_mantle_convection_tpu.sim.ini import (GaiaIniConfig,
                                                    create_ini_file)
    from pbml_mantle_convection_tpu.sim.rollout import rollout_native
    from pbml_mantle_convection_tpu.sim.stepper import TimeStepper
    from pbml_mantle_convection_tpu.utils.evaluation import compare_rollouts
    from pbml_mantle_convection_tpu.utils.jit import tpu_jit

    H = args.layers + 2
    W = int(args.layers * args.ar) + 2
    dtype = jnp.float32
    grid = Grid(H=H, W=W, aspect=args.ar, dtype="float32")
    pp = SimParams(args.raq, args.fkt, args.fkp)
    print(f"grid {H}x{W}, params raq={pp.raq} fkt={pp.fkt:.0e} "
          f"fkp={pp.fkp}, intervene_TS={args.intervene}",
          file=sys.stderr)

    model = NewFluidNet(levels=args.levels, c_i=7, c_h=args.c_h, c_o=1,
                        act_fn="gelu", r_p="learned", loss_type="curl",
                        repeats=args.repeats, f=5, p_pred=False,
                        dtype=dtype)
    tmpl = model.init(jax.random.PRNGKey(3),
                      jnp.zeros((1, H, W, 7), dtype))
    if args.weights:
        from pbml_mantle_convection_tpu.utils.checkpoint import (
            restore_checkpoint)
        restored = restore_checkpoint(args.weights, tmpl)
        weights = restored.get("params", restored) \
            if isinstance(restored, dict) and "params" in restored \
            else restored
    else:
        weights = tmpl

    fast = FastNewFluidNet(model, weights, H, W)

    def mk_stepper():
        return TimeStepper(grid=grid, params=pp, apply_fn=fast,
                           cn_max=0.99, dtype=dtype)

    T0 = np.clip(1.0 - grid.yc_np
                 + 0.04 * np.cos(3 * np.pi * grid.xc_np
                                 / args.ar)
                 * np.sin(np.pi * grid.yc_np), 0.0, 1.0)
    T0[0, :], T0[-1, :] = 1.0, 0.0

    # ---- A. in-framework ML (AD energy step every step) ----
    eng = SimEngine(grid=grid, params=pp, stepper=mk_stepper(),
                    mode="ML_STOKES", dtype=dtype)
    st = eng.init_state(jnp.asarray(T0, dtype)[None])
    st, trace = tpu_jit(eng.multi_step, static_argnums=1)(st, args.steps)
    tA = np.asarray(trace.t, np.float64)
    mA = np.asarray(trace.mean_T, np.float64)
    print(f"A in-framework ML: t_end={tA[-1]:.5f} meanT={mA[-1]:.5f}",
          file=sys.stderr)

    # ---- native paths ----
    def native_run(mode, intervene):
        import tempfile
        ini = os.path.join(tempfile.mkdtemp(), "Gaia.ini")
        create_ini_file(ini, GaiaIniConfig(
            mode=mode, raq=pp.raq, fkt=pp.fkt, fkp=pp.fkp,
            layers=args.layers, aspect_ratio=args.ar))
        sim = Direct()
        sim.init1()
        sim.iniLoad(ini)
        sim.init2()
        assert sim.shape == (H, W), (sim.shape, H, W)
        state = sim.getState()
        state["T"][:] = T0.reshape(-1)       # identical initial state
        sim.updateViscosity()
        t, n, snaps, T_vec, t_vec, TS_vec = rollout_native(
            sim, mk_stepper(), mode=mode, t_end=float(tA[-1]) * 1.05,
            intervene_ts=intervene, max_steps=args.steps,
            save_steps=1, write_steps=10**9)
        return (np.asarray(t_vec[1:], np.float64),
                np.asarray(T_vec[1:], np.float64), n)

    tB, mB, nB = native_run("ML", args.intervene)
    print(f"B native interleave (every {args.intervene}): "
          f"t_end={tB[-1]:.5f} meanT={mB[-1]:.5f} steps={nB}",
          file=sys.stderr)
    tC, mC, nC = native_run("ML_STOKES", 1)
    print(f"C native every-step: t_end={tC[-1]:.5f} meanT={mC[-1]:.5f} "
          f"steps={nC}", file=sys.stderr)

    rB = compare_rollouts(tA, mA, tB, mB)
    rC = compare_rollouts(tA, mA, tC, mC)
    out = {
        "grid": [H, W], "steps": args.steps,
        "intervene_ts": args.intervene,
        "params": [pp.raq, pp.fkt, pp.fkp],
        "trained_weights": bool(args.weights),
        "A_t_end": float(tA[-1]),
        "B_native_interleave": {"trace_rmse": rB["rmse"],
                                "trace_max_abs": rB["max_abs"],
                                "t_end": float(tB[-1])},
        "C_native_everystep": {"trace_rmse": rC["rmse"],
                               "trace_max_abs": rC["max_abs"],
                               "t_end": float(tC[-1])},
        "mean_T_drift_A": float(abs(mA[-1] - mA[0])),
    }
    print(json.dumps(out, indent=1) if not args.json
          else json.dumps(out))
    return out


if __name__ == "__main__":
    main()

"""Coupled-rollout CLI — the framework's ``advect_wi_gaia.py`` equivalent.

Modes (advect_wi_gaia.py:218-222):
  GAIA       — native engine alone (energy side; momentum from caller)
  ML         — surrogate + explicit AD update, native energy step every
               ``--intervene_TS`` steps
  ML_STOKES  — surrogate Stokes + energy step every step
  ML_PRE     — surrogate prediction warm-starts a short iterative PT
               momentum solve each step (advect_wi_gaia.py:221,488;
               solver config prepare_gaia_ini.py:146)

``--engine jax`` (default) runs everything on-device via lax.scan;
``--engine native`` drives the C++ engine step by step (verification
path). Outputs the reference pickle set (snapshots/T_vec/t_vec/TS_vec).
"""

from __future__ import annotations

import argparse
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Advect with the sim engine")
    p.add_argument("-f", "--c_h", type=int, default=16)
    p.add_argument("-s", "--use_symm", type=int, default=1)
    p.add_argument("-l", "--levels", type=int, default=6)
    p.add_argument("-r", "--repeats", type=int, default=4)
    p.add_argument("-k", "--kernel", type=int, default=5)
    p.add_argument("-w", "--warm_up_steps", type=int, default=0)
    p.add_argument("-i", "--intervene_TS", type=int, default=1)
    p.add_argument("-t", "--t_end", type=float, default=10.0)
    p.add_argument("-m", "--mode", type=str, default="GAIA")
    p.add_argument("-save", "--save_steps", type=int, default=200)
    p.add_argument("-write", "--write_steps", type=int, default=200)
    p.add_argument("-ad", "--advection_scheme", type=int, default=2)
    p.add_argument("-raq", "--raq", type=float, required=True)
    p.add_argument("-fkt", "--fkt", type=float, required=True)
    p.add_argument("-fkp", "--fkp", type=float, required=True)
    p.add_argument("-pp", "--p_pred", type=int, default=0)
    p.add_argument("-lt", "--loss_type", type=str, default="curl")
    p.add_argument("-net", "--network", type=str, default="newfluidnet")
    p.add_argument("-fac", "--factor", type=int, default=2)
    p.add_argument("-pad", "--r_p", type=str, default="learned")
    p.add_argument("-e", "--epoch", type=int, default=-1)
    p.add_argument("-cool", "--core_cool", type=int, default=0)
    p.add_argument("-decay", "--radioactive_decay", type=int, default=0)
    p.add_argument("-init", "--initialization", type=str, default="hot")
    p.add_argument("-sol", "--solver", type=str, default="mumps")
    p.add_argument("-u", "--urf", type=float, default=1.0)
    p.add_argument("-di", "--Di", type=float, default=0.0)
    p.add_argument("--nn_dir", type=str, default=None,
                   help="trained-network dir (None: random init weights)")
    p.add_argument("--out_dir", type=str, default="./GAIA_ML_RUNS")
    p.add_argument("--engine", type=str, default="jax",
                   choices=["jax", "native"])
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--fast", type=int, default=1,
                   help="use the space-to-depth fast executor for "
                        "newfluidnet (exact; PERF.md)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..constants import SimParams
    from ..models.registry import ModelConfig, build_model
    from ..sim.engine import SimEngine
    from ..sim.grid import Grid
    from ..sim.ini import GaiaIniConfig, create_ini_file, run_name
    from ..sim.profiles import calc_mlp_profile
    from ..sim.rollout import rollout_jax, rollout_native
    from ..sim.stepper import TimeStepper
    from ..utils.checkpoint import restore_checkpoint
    from ..utils.jit import enable_compilation_cache

    enable_compilation_cache()

    params_phys = SimParams(args.raq, args.fkt, args.fkp)
    ini_cfg = GaiaIniConfig(
        mode=args.mode, raq=args.raq, fkt=args.fkt, fkp=args.fkp,
        advection_scheme=args.advection_scheme,
        intervene_ts=args.intervene_TS, warm_up_steps=args.warm_up_steps,
        solver=args.solver, initialization=args.initialization,
        urf=args.urf, Di=args.Di, core_cool=bool(args.core_cool),
        radioactive_decay=bool(args.radioactive_decay))

    gaia_dir = os.path.join(args.out_dir,
                            run_name(ini_cfg, network=args.network))
    os.makedirs(gaia_dir, exist_ok=True)

    # T(z) profile init (advect_wi_gaia.py:227)
    calc_mlp_profile([args.raq], [args.fkt], [args.fkp], gaia_dir)
    import dataclasses as _dc
    f_ini = os.path.join(gaia_dir, "Gaia.ini")
    create_ini_file(f_ini, _dc.replace(
        ini_cfg, profile_file=os.path.join(gaia_dir, "ml_prof.txt")))

    grid = Grid()
    dtype = jnp.float32

    # surrogate (ML modes)
    apply_fn = None
    if args.mode != "GAIA":
        mc = ModelConfig(
            network=args.network, levels=args.levels, c_h=args.c_h,
            act_fn="gelu", r_p=args.r_p, loss_type=args.loss_type,
            use_symm=bool(args.use_symm), repeats=args.repeats,
            kernel=args.kernel, p_pred=bool(args.p_pred),
            factor=args.factor, dtype=dtype)
        model = build_model(mc)
        x0 = jnp.zeros((1, grid.H, grid.W, mc.channels[0]), dtype)
        weights = model.init(jax.random.PRNGKey(0), x0)
        if args.nn_dir:
            from ..train.trainer import best_epoch_from_log
            log = os.path.join(args.nn_dir, "fluidnet_uvpT.txt")
            epoch = (best_epoch_from_log(log) if args.epoch == -1
                     else args.epoch)
            ckpt = os.path.join(args.nn_dir, f"{epoch}_fluidnet_uvp.ckpt")
            weights = restore_checkpoint(ckpt)["params"]
            print(f"loaded epoch {epoch}")
        if (args.fast and args.network == "newfluidnet"
                and args.r_p in ("learned", "zeros")
                and not args.use_symm):
            from ..models.fast_path import FastNewFluidNet
            apply_fn = FastNewFluidNet(model, weights, grid.H, grid.W)
        else:
            apply_fn = lambda x: model.apply(weights, x)  # noqa: E731

    stepper = None
    if apply_fn is not None:
        stepper = TimeStepper(
            grid=grid, params=params_phys, apply_fn=apply_fn,
            net=args.network, cn_max=0.99,
            core_cool=bool(args.core_cool), dtype=dtype)

    if args.engine == "native" or args.mode == "GAIA":
        from ..sim.gaia_native import Direct
        sim = Direct()
        sim.init1()
        sim.iniLoad(os.path.join(gaia_dir, "ini", "default.ini"))
        sim.iniLoad(f_ini)
        sim.init2()
        if args.mode == "GAIA":
            # self-contained native run: momentum from the engine's own
            # urf_mm iterative solver (prepare_gaia_ini.py:139-146)
            sim.setSolveMomentum(True)
        out = rollout_native(
            sim, stepper, mode=args.mode, t_end=args.t_end,
            intervene_ts=args.intervene_TS,
            warm_up_steps=args.warm_up_steps,
            save_steps=args.save_steps, write_steps=args.write_steps,
            gaia_dir=gaia_dir, core_cool=bool(args.core_cool),
            p_pred=bool(args.p_pred), max_steps=args.max_steps)
        print(f"native rollout done: t={out[0]:.4f} steps={out[1]}")
        return out

    stokes_fn = None
    if args.mode == "ML_PRE":
        from ..physics.stokes import make_stokes_fn
        stokes_fn = make_stokes_fn(grid, args.raq)

    engine = SimEngine(
        grid=grid, params=params_phys, stepper=stepper, mode=args.mode,
        intervene_ts=args.intervene_TS,
        radioactive_decay=bool(args.radioactive_decay),
        core_cool=bool(args.core_cool), Di=args.Di, dtype=dtype,
        stokes_fn=stokes_fn)

    # initial temperature from the predicted profile ("perfect"), linear,
    # hot or cold starts (prepare_gaia_ini.py:64-67, 94-96)
    y_pred, y_prof = calc_mlp_profile([args.raq], [args.fkt], [args.fkp])
    yc = grid.yc_np
    if args.initialization == "perfect":
        prof = np.interp(1.0 - yc[:, 0], y_prof[::-1], y_pred[0][::-1])
        T0 = np.broadcast_to(prof[:, None], yc.shape).copy()
    elif args.initialization == "linear":
        T0 = 1.0 - yc
    elif args.initialization == "cold":
        T0 = np.zeros_like(yc)
    else:
        T0 = np.ones_like(yc)
    xc = grid.xc_np
    T0 = T0 + 0.01 * np.cos(np.pi * xc / grid.aspect) * np.sin(np.pi * yc)
    T0[0, :] = 1.0
    T0[-1, :] = 0.0

    n_steps = args.max_steps or 2000
    state, trace, snaps = rollout_jax(
        engine, jnp.asarray(T0, dtype)[None], n_steps, gaia_dir=gaia_dir,
        mode=args.mode, snapshot_every=max(1, n_steps // args.save_steps))
    print(f"jax rollout done: t={float(state.t):.5f} steps={n_steps} "
          f"meanT={float(trace.mean_T[-1]):.4f}")
    return state


if __name__ == "__main__":
    main()

"""Benchmark CLI: surrogate inference latency + coupled rollout throughput.

The inference harness mirrors the reference's timing loop (mean over 500
no-grad forward passes, batch 1 — load_fluidnet.ipynb cell 7); the rollout
benchmark is the repo-root ``bench.py`` headline metric, callable here at
any grid size.
"""

from __future__ import annotations

import argparse
import json
import time


def build_parser():
    p = argparse.ArgumentParser(description="benchmarks")
    p.add_argument("--what", choices=["inference", "rollout", "train"],
                   default="inference")
    p.add_argument("-net", "--network", type=str, default="newfluidnet")
    p.add_argument("-l", "--levels", type=int, default=5)
    p.add_argument("-f", "--c_h", type=int, default=16)
    p.add_argument("-r", "--repeats", type=int, default=6)
    p.add_argument("-k", "--kernel", type=int, default=5)
    p.add_argument("-pad", "--r_p", type=str, default="learned")
    p.add_argument("--H", type=int, default=128)
    p.add_argument("--W", type=int, default=506)
    p.add_argument("--iters", type=int, default=500)
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--dtype", type=str, default="float32")
    p.add_argument("--batch", type=int, default=None,
                   help="simultaneous simulations per rollout step "
                        "(B>1: batched multi-sim throughput); for "
                        "--what train, the train-step batch size "
                        "(default 8, the production size; an explicit "
                        "--batch 1 is honored)")
    p.add_argument("--roll_forward", type=int, default=1,
                   help="--what train, unet: autoregressive unroll "
                        "depth (multigpu.py:207-251)")
    p.add_argument("--raw-module", action="store_true",
                   help="time the plain Flax apply instead of the "
                        "rollout-optimized executor")
    p.add_argument("--donate", action="store_true",
                   help="--what train: donate params/opt_state buffers "
                        "to XLA (the epoch-loop calling convention)")
    p.add_argument("--remat", action="store_true",
                   help="--what train: rematerialize the forward in "
                        "the backward (TrainStepConfig.remat)")
    p.add_argument("--sharded", action="store_true",
                   help="batch-sharded multi-sim rollout over ALL "
                        "available devices (one sim per chip, per-chip "
                        "megakernel path); degrades to 1 chip")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.batch is None:
        # per-mode default: train uses the production batch size 8,
        # everything else a single sim; explicit values (incl. 1) pass
        # through untouched (ADVICE r4)
        args.batch = 8 if args.what == "train" else 1

    import jax
    import jax.numpy as jnp

    from ..models.registry import ModelConfig, build_model
    from ..utils.jit import enable_compilation_cache

    enable_compilation_cache()

    dtype = jnp.dtype(args.dtype)
    mc = ModelConfig(network=args.network, levels=args.levels,
                     c_h=args.c_h, repeats=args.repeats, kernel=args.kernel,
                     r_p=args.r_p, loss_type="curl", p_pred=False,
                     H=args.H, W=args.W, dtype=dtype)
    model = build_model(mc)
    c_i, _ = mc.channels
    if "transolver" in args.network:
        x = jnp.zeros((1, args.H * args.W, c_i), dtype)
    else:
        x = jnp.zeros((1, args.H, args.W, c_i), dtype)
    params = model.init(jax.random.PRNGKey(0), x)

    if args.what == "inference":
        # measure the optimized executor where it applies (--raw-module
        # measures the plain Flax apply, the reference harness analogue)
        if (not args.raw_module and args.network == "newfluidnet"
                and args.r_p in ("learned", "zeros")
                and args.kernel == 5):
            from ..models.fast_path import FastNewFluidNet
            from ..utils.jit import tpu_jit
            fast = FastNewFluidNet(model, params, args.H, args.W)
            fwd = tpu_jit(lambda p, x: fast(x))
        else:
            fwd = jax.jit(lambda p, x: model.apply(p, x))
        out = fwd(params, x)
        jax.block_until_ready(jax.tree.leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fwd(params, x)
        jax.block_until_ready(jax.tree.leaves(out)[0])
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        print(json.dumps({
            "metric": f"inference_latency_{args.network}_"
                      f"{args.H}x{args.W}",
            "value": round(ms, 4), "unit": "ms",
            "iters": args.iters}))
        return ms

    if args.what == "train":
        # DP training throughput: the jitted shard_map train step on a
        # synthetic batch (the reference's dominant compute —
        # multigpu.py:340-410 epoch loops; its per-batch wall time is
        # the only number it prints). Batch = --batch (default 8, the
        # production batch size); mesh over all devices, degrades to 1.
        import numpy as np
        import optax
        from jax.sharding import Mesh
        from ..parallel.mesh import DATA_AXIS, shard_batch
        from ..train.train_step import TrainStepConfig, make_train_step

        B = args.batch
        devs = np.array(jax.devices())
        if B % devs.size:
            raise SystemExit(f"--batch {B} not divisible by "
                             f"{devs.size} devices")
        mesh = Mesh(devs, (DATA_AXIS,)) if devs.size > 1 else None
        cfg = TrainStepConfig(net=args.network, p_pred=False,
                              loss_scale=True, loss_derivative=True,
                              loss_type="curl", remat=args.remat,
                              roll_forward=args.roll_forward)
        step = make_train_step(model.apply, optax.adam(1e-3), cfg,
                               mesh=mesh, donate=args.donate)
        opt_state = optax.adam(1e-3).init(params)
        rs = np.random.default_rng(0)
        is_unet = args.network in ("unet", "iunet")
        # fluidnet target: (u, v); unet target: (u, v, T)
        c_y = 3 if is_unet else 2
        batch = {
            "x": jnp.asarray(rs.normal(size=(B, args.H, args.W, c_i)),
                             dtype),
            "y": jnp.asarray(rs.normal(size=(B, c_y, args.H, args.W)),
                             dtype),
        }
        if is_unet:
            # roll_forward reassembly inputs (train_step._unet_reassemble)
            from ..sim.grid import Grid
            g = Grid(H=args.H, W=args.W,
                     aspect=(args.W - 2) / (args.H - 2), dtype=str(dtype))
            batch["paras"] = jnp.tile(
                jnp.asarray([[3.0, 1e8, 10.0]], dtype), (B, 1))
            batch["yc"] = jnp.broadcast_to(g.yc.astype(dtype),
                                           (B, args.H, args.W))
        if mesh is not None:
            batch = shard_batch(mesh, batch)
        pp, oo, br = step(params, opt_state, batch)  # compile + warm
        jax.block_until_ready(br.total)
        n = args.iters
        t0 = time.perf_counter()
        for _ in range(n):
            # params/opt_state evolve → every dispatch is unique (the
            # relay dedupes identical (program, args) pairs, PERF.md)
            pp, oo, br = step(pp, oo, batch)
        jax.block_until_ready(br.total)
        dt_wall = (time.perf_counter() - t0) / n
        rf = (f"_rf{args.roll_forward}" if args.roll_forward > 1
              else "")
        rf += ("_donate" if args.donate else "") + \
              ("_remat" if args.remat else "")
        print(json.dumps({
            "metric": f"train_step_{args.network}_{args.H}x{args.W}"
                      f"_B{B}{rf}",
            "value": round(dt_wall * 1e3, 3), "unit": "ms",
            "samples_per_s": round(B / dt_wall, 2),
            "n_devices": int(devs.size),
            "loss": float(br.total)}))
        return dt_wall

    # rollout: reuse the repo-root bench machinery at this grid size
    from ..constants import SimParams
    from ..sim.engine import SimEngine
    from ..sim.grid import Grid
    from ..sim.stepper import TimeStepper

    grid = Grid(H=args.H, W=args.W,
                aspect=(args.W - 2) / (args.H - 2), dtype=str(dtype))
    pp = SimParams(3.0, 1e8, 10.0)
    # rollout-optimized executor where the config allows it (the same
    # path bench.py ships; falls back inside FastNewFluidNet otherwise)
    apply_fn = lambda xx: model.apply(params, xx)
    if (args.network == "newfluidnet" and args.r_p in ("learned", "zeros")
            and args.kernel == 5):
        from ..models.fast_path import FastNewFluidNet
        apply_fn = FastNewFluidNet(model, params, args.H, args.W)
    stepper = TimeStepper(grid=grid, params=pp, apply_fn=apply_fn,
                          net=args.network, cn_max=0.99, dtype=dtype)
    engine = SimEngine(grid=grid, params=pp, stepper=stepper, dtype=dtype)
    T0_1 = jnp.clip(1.0 - grid.yc + 0.05 * jnp.sin(6.28 * grid.xc),
                    0, 1).astype(dtype)
    # B>1: phase-shifted initial fields, one scan advances all sims
    T0 = jnp.stack([jnp.clip(1.0 - grid.yc
                             + 0.05 * jnp.sin(6.28 * grid.xc + 0.37 * b),
                             0, 1).astype(dtype)
                    for b in range(args.batch)]) if args.batch > 1 \
        else T0_1[None]
    if args.sharded:
        # multi-chip throughput: one independent sim per device via
        # shard_map (parallel/rollout.py) — each chip traces at local
        # B=1 so it runs the megakernel executor; no collectives, so
        # aggregate sim-steps/s scales linearly with mesh size.  On a
        # single chip this measures the same program structure the
        # multi-chip dryrun validates (__graft_entry__.dryrun_multichip).
        import numpy as np
        from jax.sharding import Mesh
        from ..parallel.mesh import DATA_AXIS
        from ..parallel.rollout import make_batch_sharded
        devs = np.array(jax.devices())
        n_dev = devs.size
        B = args.batch if args.batch > 1 else n_dev
        if B % n_dev:
            raise SystemExit(f"--batch {B} not divisible by {n_dev} devices")
        mesh = Mesh(devs, (DATA_AXIS,))
        mk_T0 = lambda phase: jnp.stack(
            [jnp.clip(1.0 - grid.yc
                      + 0.05 * jnp.sin(6.28 * grid.xc + 0.37 * b + phase),
                      0, 1).astype(dtype) for b in range(B)])
        f = make_batch_sharded(engine, args.steps, mesh)
        # warm with a DIFFERENT T0 than the timed call: the axon relay
        # dedupes identical (program, args) dispatches (PERF.md)
        out0 = f(mk_T0(0.11))
        jax.block_until_ready(out0[0])
        T0s = mk_T0(0.0)
        t0 = time.perf_counter()
        out1 = f(T0s)
        jax.block_until_ready(out1[0])
        sps = args.steps / (time.perf_counter() - t0)
        print(json.dumps({
            "metric": f"sharded_rollout_{args.H}x{args.W}",
            "value": round(sps * B, 2), "unit": "sim_steps/s",
            "n_devices": int(n_dev), "batch": int(B),
            "rollout_steps_per_s": round(sps, 2)}))
        return sps * B

    state = engine.init_state(T0)
    from ..utils.jit import tpu_jit
    multi = tpu_jit(engine.multi_step, static_argnums=1)
    # warm with the measured step count: static_argnums means a
    # different n would recompile inside the timed region
    state, _ = multi(state, args.steps)
    jax.block_until_ready(state.T)
    t0 = time.perf_counter()
    state, _ = multi(state, args.steps)
    jax.block_until_ready(state.T)
    sps = args.steps / (time.perf_counter() - t0)
    suffix = f"_B{args.batch}" if args.batch > 1 else ""
    # non-flagship nets (unet, …) get their own metric name so the
    # headline newfluidnet figure stays comparable across rounds
    net_tag = "" if args.network == "newfluidnet" else f"_{args.network}"
    out = {"metric": f"rollout_steps_per_s{net_tag}_{args.H}x{args.W}"
                     f"{suffix}",
           "value": round(sps, 2), "unit": "steps/s"}
    if args.batch > 1:
        # sim-steps/s: the throughput-deployment figure (B sims advance
        # per rollout step)
        out["sim_steps_per_s"] = round(sps * args.batch, 2)
    print(json.dumps(out))
    return sps


if __name__ == "__main__":
    main()

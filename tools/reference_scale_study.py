"""Reference-scale training demonstration (VERDICT round-2 item 3).

The reference's core artifact is a surrogate trained on multi-simulation
GAIA data at 128×506 (multigpu.py:694-759: rank-sharded sim lists, 150
epochs) rolled out through advect_wi_gaia.py:583-677. The real dataset is
not mounted, so this tool *shows the machinery working at reference
scale* on synthetically generated ground truth:

1. **data**: N_train+1 GAIA-mode simulations at the production 128×506
   grid, dataset-range viscosity contrasts (fkt ≥ 1e6,
   prepare_gaia_ini.py:33-35), each rolled out with the ptol-converged
   PT Stokes solver (physics/stokes.py — the MUMPS stand-in) and
   snapshotted into a multi-sim SnapshotStore; the first 5 snapshots of
   each sim form the "init" store (datasetio.py:441-457 split);
2. **training**: the flagship config (levels=5, c_h=16, repeats=6, k=5,
   learned padding, curl head, loss_scale + derivative loss) through the
   actual ``Trainer`` (epoch loops, init-batch mixing, MultiStepLR,
   reference-format loss log) on a DP device mesh, with a mid-run
   stop → ``restart=True`` resume exercising checkpoint/restart
   (multigpu.py:621-670);
3. **evaluation**: held-out-sim rollouts in ML_STOKES and ML_PRE modes
   vs the held-out GAIA trajectory — final-T RMSE / Pearson, mean-T
   trace RMSE, horizontally-averaged profile MAE — against the same
   metrics for an UNTRAINED (fresh-init) surrogate: the
   trained-beats-untrained margin.

Writes STUDY_REFSCALE.md + STUDY_REFSCALE.json at --out-dir.

Usage (TPU, ~30-60 min):   python tools/reference_scale_study.py
Smoke test (CPU, minutes): python tools/reference_scale_study.py \
    --H 34 --W 66 --steps 40 --epochs 4 --snap-every 1
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--H", type=int, default=128)
    p.add_argument("--W", type=int, default=506)
    p.add_argument("--steps", type=int, default=150,
                   help="GAIA ground-truth steps per simulation")
    p.add_argument("--snap-every", type=int, default=1)
    p.add_argument("--epochs", type=int, default=24)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--levels", type=int, default=5)
    p.add_argument("--c_h", type=int, default=16)
    p.add_argument("--repeats", type=int, default=6)
    p.add_argument("--n-train-sims", type=int, default=3)
    p.add_argument("--n-iter", type=int, default=20000,
                   help="PT iteration budget per solve (ptol early-stops)")
    p.add_argument("--eval-steps", type=int, default=0,
                   help="rollout steps for evaluation (0 = --steps)")
    p.add_argument("--out-dir", type=str,
                   default=os.path.join(os.path.dirname(__file__), ".."))
    p.add_argument("--run-dir", type=str, default="/tmp/pmc_refscale")
    p.add_argument("--device", choices=["default", "cpu"],
                   default="default",
                   help="cpu forces jax_platforms=cpu (the axon TPU "
                        "relay overrides the JAX_PLATFORMS env var)")
    return p


# Fallback parameter triples inside the dataset's ranges
# (constants.py:31-34 clip bounds; prepare_gaia_ini.py:33-35):
# raq ∈ [~1, 9.4], fkt to 10^9.9, fkp to 100. Used only when the real
# sims.pt metadata (130 sims, tuples (id, split, raq, fkt, fkp, grid,
# ar, path) — datasetio.py:33,96) is not mounted.
TRAIN_PARAS = [(3.0, 1e6, 5.0), (5.0, 1e7, 10.0), (2.0, 3e6, 2.0)]
HOLDOUT_PARA = (4.0, 3e6, 7.0)
SIMS_PT = "/root/reference/Paper/FiguresData/sims.pt"
BLACKLIST = (8, 39)  # datasetio.py:96


def real_paras(n_train: int, fkt_max: float = 3e8):
    """Select real (raq, fkt, fkp) triples from the mounted sims.pt:
    ``n_train`` train-split sims plus one test-split holdout, skipping
    the blacklist [8, 39] (datasetio.py:33,96). Deterministic: sims are
    ranked by fkt and picked at even quantiles below ``fkt_max`` (the
    PT-solver ground-truth generator is the practical bound — MUMPS
    handles 10^9.9 contrasts, an explicit pseudo-transient solve on the
    study's iteration budget does not). Returns (train_paras,
    holdout_para, ids) or None when sims.pt is unavailable."""
    try:
        import torch
        sims = torch.load(SIMS_PT, weights_only=False)
    except Exception:
        return None

    def pick(split, k):
        rows = sorted((s for s in sims
                       if s[1] == split and s[0] not in BLACKLIST
                       and s[3] <= fkt_max),
                      key=lambda s: s[3])
        if len(rows) < k:
            # too few sims survive the blacklist/fkt_max filters — tell
            # the caller to fall back to TRAIN_PARAS rather than raising
            # or silently duplicating triples (ADVICE r4)
            return None
        idx = [round(i * (len(rows) - 1) / max(k - 1, 1))
               for i in range(k)]
        return [rows[i] for i in idx]

    tr = pick("train", n_train)
    ho_rows = pick("test", 3)
    if tr is None or ho_rows is None:
        return None
    ho = ho_rows[1]  # the mid-quantile test sim
    paras = [(float(s[2]), float(s[3]), float(s[4])) for s in tr]
    return paras, (float(ho[2]), float(ho[3]), float(ho[4])), (
        [int(s[0]) for s in tr], int(ho[0]))


def main(argv=None):
    args = build_parser().parse_args(argv)
    eval_steps = args.eval_steps or args.steps

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from pbml_mantle_convection_tpu.constants import SimParams
    from pbml_mantle_convection_tpu.data import (SnapshotDataset,
                                                 SnapshotStore)
    from pbml_mantle_convection_tpu.models.registry import ModelConfig
    from pbml_mantle_convection_tpu.physics.stokes import make_stokes_fn
    from pbml_mantle_convection_tpu.sim.engine import SimEngine
    from pbml_mantle_convection_tpu.sim.grid import Grid
    from pbml_mantle_convection_tpu.sim.stepper import TimeStepper
    from pbml_mantle_convection_tpu.train.trainer import (TrainConfig,
                                                          Trainer)
    from pbml_mantle_convection_tpu.utils.evaluation import (
        compare_rollouts, pearson, temperature_rmse)
    from pbml_mantle_convection_tpu.utils.jit import tpu_jit

    sel = real_paras(args.n_train_sims)
    if sel is not None:
        train_paras, holdout_para, (train_ids, holdout_id) = sel
        print(f"[paras] real sims.pt triples: train ids {train_ids}, "
              f"holdout id {holdout_id} (test split)")
    else:
        train_paras, holdout_para = TRAIN_PARAS, HOLDOUT_PARA
        train_ids, holdout_id = None, None
        print("[paras] sims.pt unavailable; using fallback triples")

    dev = jax.devices()[0].platform
    dtype = jnp.float32
    grid = Grid(H=args.H, W=args.W,
                aspect=(args.W - 2) / (args.H - 2), dtype="float32")
    print(f"device={dev} grid={args.H}x{args.W} aspect={grid.aspect:.2f}")

    null_stepper = TimeStepper(
        grid=grid, params=SimParams(*train_paras[0]),
        apply_fn=lambda x: (None, None, None), dtype=dtype)

    def t_init(seed):
        """Smooth conductive + perturbation initial state (the driver's
        stamped initial condition class)."""
        rs = np.random.default_rng(seed)
        amp = 0.04 + 0.02 * rs.random()
        kx = rs.integers(2, 5)
        T0 = (1.0 - grid.yc_np
              + amp * np.cos(kx * np.pi * grid.xc_np
                             / grid.aspect)
              * np.sin(np.pi * grid.yc_np))
        T0[0, :], T0[-1, :] = 1.0, 0.0
        return jnp.asarray(np.clip(T0, 0, 1.35), dtype)[None]

    def gaia_rollout(paras, seed, n_steps):
        """Ground-truth trajectory: converged PT solve every step."""
        params = SimParams(*paras)
        eng = SimEngine(
            grid=grid, params=params, stepper=null_stepper, mode="GAIA",
            stokes_fn=make_stokes_fn(grid, raq=params.raq,
                                     n_iter=args.n_iter),
            dtype=dtype)
        state = eng.init_state(t_init(seed))
        step = jax.jit(eng.step)
        snaps, t_vec, mT = [], [], []
        for i in range(n_steps):
            state = step(state)
            if i % args.snap_every == 0:
                snaps.append((np.asarray(state.T[0]),
                              np.asarray(state.u[0]),
                              np.asarray(state.v[0])))
            t_vec.append(float(state.t))
            mT.append(float(jnp.mean(state.T)))
        return state, snaps, np.asarray(t_vec), np.asarray(mT)

    # ---- 1. ground-truth data ----
    t_start = time.time()
    all_snaps, all_paras, all_steps, all_sids = [], [], [], []
    for sid, paras in enumerate(train_paras):
        t0 = time.time()
        _, snaps, _, _ = gaia_rollout(paras, seed=100 + sid,
                                      n_steps=args.steps)
        print(f"[data] sim {sid} raq={paras[0]} fkt={paras[1]:.0e} "
              f"fkp={paras[2]}: {len(snaps)} snapshots "
              f"({time.time() - t0:.0f}s)")
        all_snaps += snaps
        all_paras += [paras] * len(snaps)
        all_steps += [i * args.snap_every + 1 for i in range(len(snaps))]
        all_sids += [sid] * len(snaps)

    def mk_store(sel):
        return SnapshotStore(
            T=np.asarray([all_snaps[i][0] for i in sel]),
            u=np.asarray([all_snaps[i][1] for i in sel]),
            v=np.asarray([all_snaps[i][2] for i in sel]), p=None,
            paras=np.asarray([all_paras[i] for i in sel], np.float64),
            step_index=np.asarray([all_steps[i] for i in sel],
                                  np.float64),
            sim_id=np.asarray([all_sids[i] for i in sel], np.float64),
            times=np.zeros(len(sel)),
            xc=grid.xc_np, yc=grid.yc_np)

    # init/main split per sim (first 5 snapshots are the init stream,
    # select_snapshot_indices semantics); cv = every 8th main snapshot
    idx = np.arange(len(all_snaps))
    is_init = np.asarray([all_steps[i] <= 5 * args.snap_every
                          for i in idx])
    main_idx = idx[~is_init]
    ds_main = mk_store(main_idx[main_idx % 8 != 0])
    ds_cv = mk_store(main_idx[main_idx % 8 == 0])
    ds_init = mk_store(idx[is_init])
    print(f"[data] store: {len(ds_main)} train / {len(ds_cv)} cv / "
          f"{len(ds_init)} init snapshots "
          f"({time.time() - t_start:.0f}s total)")

    train_data = SnapshotDataset(ds_main, scale=True, noise=1e-5,
                                 dtype=dtype)
    cv_data = SnapshotDataset(ds_cv, scale=True, dtype=dtype)
    init_data = SnapshotDataset(ds_init, scale=True, dtype=dtype)

    # ---- 2. flagship training through Trainer (DP mesh + restart) ----
    # learned-padding k=5 layers need >= 6 px in the deepest pooled
    # branch (models/fluidnet.py eager check) — clamp for smoke grids
    levels = args.levels
    while levels > 1 and min(args.H, args.W) // 2 ** (levels - 1) < 6:
        levels -= 1
    if levels != args.levels:
        print(f"[cfg] levels {args.levels} -> {levels} for the "
              f"{args.H}x{args.W} smoke grid (deepest branch >= 6 px)")
    args.levels = levels
    mc = ModelConfig(network="newfluidnet", levels=args.levels,
                     c_h=args.c_h, repeats=args.repeats, kernel=5,
                     r_p="learned", loss_type="curl", p_pred=False,
                     H=args.H, W=args.W, dtype=dtype)
    n_dev = len(jax.devices())
    cfg = TrainConfig(
        model=mc, epochs=args.epochs, batch_size=args.batch_size,
        start_lr=2e-3, loss_scale=True, loss_derivative=True,
        milestones=tuple(int(args.epochs * f) for f in (0.4, 0.65, 0.85)),
        n_devices=n_dev, seed=0)
    run_dir = args.run_dir
    os.makedirs(run_dir, exist_ok=True)

    half = max(1, args.epochs // 2)
    t0 = time.time()
    tr = Trainer(cfg, train_data, cv_data, train_data_init=init_data,
                 cv_data_init=init_data, nn_dir=run_dir)
    tr.train(epochs=half)
    print(f"[train] first leg done at epoch {half} "
          f"({time.time() - t0:.0f}s); restarting from checkpoint")
    # mid-run restart: a fresh Trainer re-derives the epoch from the
    # loss log and reloads params + optimizer state (multigpu.py:621-670)
    tr2 = Trainer(cfg, train_data, cv_data, train_data_init=init_data,
                  cv_data_init=init_data, nn_dir=run_dir, restart=True)
    assert tr2.start_epoch == half, (tr2.start_epoch, half)
    weights = tr2.train()
    train_wall = time.time() - t0
    print(f"[train] {args.epochs} epochs in {train_wall:.0f}s")

    # untrained baseline: fresh init, same architecture
    model = tr2.model
    w_raw = model.init(jax.random.PRNGKey(123),
                       jnp.zeros((1, args.H, args.W, 7), dtype))

    # ---- 3. held-out evaluation ----
    params_h = SimParams(*holdout_para)
    st_ref, _, tv_ref, mT_ref = gaia_rollout(holdout_para, seed=999,
                                             n_steps=eval_steps)
    T_ref = np.asarray(st_ref.T[0])

    from pbml_mantle_convection_tpu.models.fast_path import FastNewFluidNet

    def surrogate_rollout(w, mode):
        fast = FastNewFluidNet(model, w, args.H, args.W)
        stepper = TimeStepper(grid=grid, params=params_h, apply_fn=fast,
                              cn_max=0.99, dtype=dtype)
        kw = {}
        if mode == "ML_PRE":
            kw["stokes_fn"] = make_stokes_fn(
                grid, raq=params_h.raq, n_iter=args.n_iter,
                pre_iter=max(args.n_iter // 10, 1))
        eng = SimEngine(grid=grid, params=params_h, stepper=stepper,
                        mode=mode, dtype=dtype, **kw)
        state = eng.init_state(t_init(999))
        t0 = time.time()
        # tpu_jit raises the scoped-VMEM limit the megakernel executor
        # needs at 128×506 (utils/jit.py; plain jax.jit OOMs at the
        # 16 MB default)
        state, trace = tpu_jit(eng.multi_step, static_argnums=1)(
            state, eval_steps)
        jax.block_until_ready(state.T)
        wall = time.time() - t0
        cmp = compare_rollouts(tv_ref, mT_ref,
                               np.asarray(trace.t),
                               np.asarray(trace.mean_T))
        Tp = np.asarray(state.T[0])
        prof_mae = float(np.mean(np.abs(Tp.mean(axis=1)
                                        - T_ref.mean(axis=1))))
        return dict(t_rmse=temperature_rmse(Tp, T_ref),
                    pearson=pearson(Tp, T_ref),
                    trace_rmse=cmp["rmse"], profile_mae=prof_mae,
                    wall_s=round(wall, 1))

    rows = {}
    for name, w, mode in [("ML_STOKES (trained)", weights, "ML_STOKES"),
                          ("ML_PRE (trained)", weights, "ML_PRE"),
                          ("ML_STOKES (untrained)", w_raw, "ML_STOKES")]:
        print(f"[eval] rollout {name}...")
        rows[name] = surrogate_rollout(w, mode)
        print(f"       {rows[name]}")

    # ---- 4. report ----
    margin = (rows["ML_STOKES (untrained)"]["t_rmse"]
              / max(rows["ML_STOKES (trained)"]["t_rmse"], 1e-12))
    lines = [
        "# STUDY_REFSCALE — reference-scale training demonstration",
        "",
        f"Flagship config (levels={args.levels}, c_h={args.c_h}, "
        f"repeats={args.repeats}, k=5, learned padding, curl head, "
        "loss_scale + derivative loss) trained through `Trainer` "
        f"(init-batch mixing, MultiStepLR, reference-format loss log, "
        f"mid-run checkpoint restart at epoch {half}) on a "
        f"{len(ds_main)}-snapshot multi-sim store: "
        f"{len(train_paras)} GAIA simulations at {args.H}x{args.W} "
        f"(sims.pt train ids {train_ids}), "
        f"{args.steps} converged-PT-solve steps each "
        f"(fkt up to {max(p[1] for p in train_paras):.0e}; "
        "physics/stokes.py with ptol early stopping). Held-out sim "
        f"(sims.pt test id {holdout_id}): "
        f"raq={holdout_para[0]:.3f}, fkt={holdout_para[1]:.2e}, "
        f"fkp={holdout_para[2]:.3f} — params unseen in training. "
        f"device={dev}, {args.epochs} epochs, DP mesh over {n_dev} "
        f"device(s), wall {train_wall:.0f}s. "
        "(tools/reference_scale_study.py; reference: "
        "multigpu.py:340-450,694-759 + advect_wi_gaia.py:583-677.)",
        "",
        "| rollout | final T-RMSE | Pearson r | mean-T trace RMSE | "
        "profile MAE | wall (s) |",
        "|---|---|---|---|---|---|",
    ]
    for name, r in rows.items():
        lines.append(
            f"| {name} | {r['t_rmse']:.5f} | {r['pearson']:.5f} | "
            f"{r['trace_rmse']:.6f} | {r['profile_mae']:.5f} | "
            f"{r['wall_s']} |")
    lines += [
        "",
        f"Trained-beats-untrained margin: **{margin:.1f}x** lower "
        "final-T RMSE on the held-out simulation. ML_PRE refines the "
        "surrogate velocities with a short warm-started PT solve "
        "(advect_wi_gaia.py:221,488) and should sit between the pure "
        "surrogate and solver-grade accuracy.",
        "",
    ]
    md = "\n".join(lines)
    os.makedirs(args.out_dir, exist_ok=True)
    with open(os.path.join(args.out_dir, "STUDY_REFSCALE.md"), "w") as f:
        f.write(md)
    with open(os.path.join(args.out_dir, "STUDY_REFSCALE.json"),
              "w") as f:
        json.dump({"grid": [args.H, args.W], "epochs": args.epochs,
                   "steps": args.steps, "device": dev,
                   "n_devices": n_dev, "train_wall_s": train_wall,
                   "train_paras": train_paras,
                   "holdout_para": holdout_para,
                   "train_sim_ids": train_ids,
                   "holdout_sim_id": holdout_id,
                   "margin": margin, "rows": rows}, f, indent=1)
    print(md)
    return rows


if __name__ == "__main__":
    main()

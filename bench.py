"""Headline benchmark: coupled surrogate rollout throughput at 256×256.

North-star target (BASELINE.md): ≥1000 coupled rollout steps/s at 256×256
on one TPU v5e chip. One coupled step = FK viscosity + 7-channel feature
assembly + flagship NewFluidNet Stokes surrogate (levels=5, c_h=16,
repeats=6, k=5, learned padding, curl head — the reference's best-studied
config, advect_wi_gaia.py:47-90) + velocity unscaling + explicit upwind
advection–diffusion energy step + BC stamping, all inside one lax.scan.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "steps/s", "vs_baseline": N/1000}
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from pbml_mantle_convection_tpu.constants import SimParams
    from pbml_mantle_convection_tpu.models import NewFluidNet
    from pbml_mantle_convection_tpu.sim.engine import SimEngine
    from pbml_mantle_convection_tpu.utils.jit import (
        enable_compilation_cache, tpu_jit)
    from pbml_mantle_convection_tpu.sim.grid import Grid
    from pbml_mantle_convection_tpu.sim.stepper import TimeStepper

    # persistent compile cache: the first process pays the full compile
    # (~2 min for the megakernel stack); later processes replay it in
    # seconds (PERF.md round-5 "compilation cache")
    log(f"compile cache: {enable_compilation_cache()}")

    backend = jax.default_backend()
    on_accel = backend not in ("cpu",)
    log(f"backend={backend} devices={jax.devices()}")

    import os
    H = int(os.environ.get("PMC_BENCH_H", "256"))
    W = int(os.environ.get("PMC_BENCH_W", "256"))
    dtype = jnp.float32
    grid = Grid(H=H, W=W, aspect=(W - 2) / (H - 2) if H != W else 1.0,
                dtype="float32")
    params_phys = SimParams(raq=3.0, fkt=1e8, fkp=10.0)

    model = NewFluidNet(
        levels=5, c_i=7, c_h=16, c_o=1, act_fn="gelu", r_p="learned",
        loss_type="curl", repeats=6, f=5, p_pred=False, dtype=dtype)

    # init params on a dummy input
    x0 = jnp.zeros((1, grid.H, grid.W, 7), dtype)
    weights = model.init(jax.random.PRNGKey(0), x0)
    n_params = sum(p.size for p in jax.tree.leaves(weights))
    log(f"model params: {n_params}")

    # rollout-optimized exact executor (space-to-depth convs, full MXU
    # lanes; bit-equal to model.apply — models/fast_path.py)
    from pbml_mantle_convection_tpu.models.fast_path import FastNewFluidNet
    apply_fn = FastNewFluidNet(model, weights, grid.H, grid.W, f=4)

    stepper = TimeStepper(grid=grid, params=params_phys, apply_fn=apply_fn,
                          cn_max=0.99, dtype=dtype)
    engine = SimEngine(grid=grid, params=params_phys, stepper=stepper,
                       mode="ML_STOKES", dtype=dtype)

    T0 = jnp.clip(1.0 - grid.yc + 0.05 * jnp.sin(6.28 * grid.xc),
                  0.0, 1.0).astype(dtype)[None]
    state = engine.init_state(T0)

    multi = tpu_jit(engine.multi_step, static_argnums=1)

    n_warm = 20 if on_accel else 4
    n_bench = 500 if on_accel else 10

    t0 = time.perf_counter()
    state, _ = multi(state, n_warm)
    jax.block_until_ready(state.T)
    log(f"warmup+compile: {time.perf_counter() - t0:.1f}s")

    best = 0.0
    for rep in range(3):
        t0 = time.perf_counter()
        state, trace = multi(state, n_bench)
        jax.block_until_ready(state.T)
        dt_wall = time.perf_counter() - t0
        sps = n_bench / dt_wall
        best = max(best, sps)
        log(f"rep {rep}: {n_bench} steps in {dt_wall:.3f}s -> "
            f"{sps:.1f} steps/s (meanT={float(trace.mean_T[-1]):.4f})")

    assert bool(jnp.all(jnp.isfinite(state.T))), "rollout diverged"

    print(json.dumps({
        "metric": f"coupled_rollout_steps_per_s_{H}x{W}",
        "value": round(best, 2),
        "unit": "steps/s",
        "vs_baseline": round(best / 1000.0, 4),
    }))


if __name__ == "__main__":
    main()

"""Hermetic multi-chip dry run on N virtual CPU devices.

Validates the full multi-device surface without TPU hardware
(SURVEY.md §4): the shard_map data-parallel train step (grads pmean'd
over the mesh — the reference's DDP all-reduce, multigpu.py:69,319),
the sequence-parallel Physics-Attention path, and a batch-sharded
multi-simulation rollout.

This module must be runnable on a machine whose TPU runtime is broken
or absent, so it forces the CPU platform *in-process* — the
``JAX_PLATFORMS`` env var alone is not honored when a site
customization registers an accelerator plugin.  Call :func:`run` only
in a process that has not yet initialized a JAX backend (the driver
entry point ``__graft_entry__.dryrun_multichip`` spawns a subprocess
for exactly this reason).
"""

from __future__ import annotations


def _force_cpu(n_devices: int) -> None:
    import os

    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags +
            f" --xla_force_host_platform_device_count={n_devices}").strip()

    import jax

    # Belt and braces: the env var is ignored once a plugin is
    # registered; the config update is authoritative.
    jax.config.update("jax_platforms", "cpu")


def run(n_devices: int) -> None:
    """Force CPU with ``n_devices`` virtual devices, then jit the FULL
    data-parallel training step over the mesh and run ONE step on tiny
    shapes, plus the sequence-parallel and batch-sharded-rollout paths."""
    _force_cpu(n_devices)

    import jax
    import jax.numpy as jnp
    import optax

    assert len(jax.devices()) >= n_devices, (
        f"expected {n_devices} CPU devices, got {jax.devices()}")

    from pbml_mantle_convection_tpu.models import NewFluidNet
    from pbml_mantle_convection_tpu.parallel.mesh import (
        make_mesh, shard_batch)
    from pbml_mantle_convection_tpu.train.train_step import (
        TrainStepConfig, make_train_step)

    mesh = make_mesh(n_devices)
    H, W = 16, 24
    batch = n_devices  # one sample per device

    model = NewFluidNet(
        levels=2, c_i=7, c_h=8, c_o=1, act_fn="gelu", r_p="learned",
        loss_type="curl", repeats=1, f=5, p_pred=False)
    x = jnp.zeros((batch, H, W, 7), jnp.float32)
    y = jnp.zeros((batch, 2, H, W), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)

    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)

    cfg = TrainStepConfig(net="newfluidnet", p_pred=False, loss_scale=True,
                          loss_derivative=True, loss_type="curl")

    def apply_fn(p, xx):
        u, v, pr = model.apply(p, xx)
        return u, v, pr

    step = make_train_step(apply_fn, optimizer, cfg, mesh=mesh)

    rng = jax.random.PRNGKey(1)
    batch_data = shard_batch(mesh, {
        "x": jax.random.normal(rng, x.shape, x.dtype),
        "y": jax.random.normal(rng, y.shape, y.dtype),
    })
    params, opt_state, br = step(params, opt_state, batch_data)
    jax.block_until_ready(params)
    print(f"dryrun_multichip({n_devices}): loss={float(br.total):.4f} "
          f"mass={float(br.mass):.4f}")

    # sequence-parallel path: Physics-Attention with the point axis
    # sharded over the same mesh (two psums over ICI)
    from pbml_mantle_convection_tpu.models import (
        PhysicsAttentionIrregularMesh)
    from pbml_mantle_convection_tpu.parallel.sequence import (
        physics_attention_sharded)

    attn = PhysicsAttentionIrregularMesh(dim=16, heads=2, dim_head=8,
                                         slice_num=4)
    xs = jax.random.normal(rng, (1, 8 * n_devices, 16), jnp.float32)
    ap = attn.init(jax.random.PRNGKey(2), xs)
    out = physics_attention_sharded(ap, xs, mesh, heads=2, dim_head=8)
    jax.block_until_ready(out)
    print(f"dryrun_multichip({n_devices}): sequence-parallel attention "
          f"ok {out.shape}")

    # batch-sharded multi-simulation rollout (one sim per device)
    from pbml_mantle_convection_tpu.constants import SimParams
    from pbml_mantle_convection_tpu.parallel.mesh import batch_sharding
    from pbml_mantle_convection_tpu.sim.engine import SimEngine
    from pbml_mantle_convection_tpu.sim.grid import Grid
    from pbml_mantle_convection_tpu.sim.stepper import TimeStepper

    grid = Grid(H=12, W=16)
    sp = SimParams(2.0, 1e6, 3.0)
    roll_model = NewFluidNet(levels=2, c_i=7, c_h=8, c_o=1, r_p="learned",
                             loss_type="curl", repeats=1, f=5,
                             p_pred=False)
    xr = jnp.zeros((1, grid.H, grid.W, 7), jnp.float32)
    wr = roll_model.init(jax.random.PRNGKey(3), xr)
    stepper = TimeStepper(grid=grid, params=sp,
                          apply_fn=lambda xx: roll_model.apply(wr, xx),
                          dtype=jnp.float32)
    eng = SimEngine(grid=grid, params=sp, stepper=stepper,
                    dtype=jnp.float32)
    T0 = jnp.broadcast_to(
        (1.0 - grid.yc).astype(jnp.float32), (n_devices,) + grid.yc.shape)
    st = eng.init_state(T0)
    sh = batch_sharding(mesh)
    st = st._replace(T=jax.device_put(st.T, sh),
                     u=jax.device_put(st.u, sh),
                     v=jax.device_put(st.v, sh),
                     p=jax.device_put(st.p, sh),
                     V=jax.device_put(st.V, sh))
    st, tr = jax.jit(eng.multi_step, static_argnums=1)(st, 3)
    jax.block_until_ready(st.T)
    print(f"dryrun_multichip({n_devices}): batch-sharded rollout ok "
          f"meanT={float(tr.mean_T[-1]):.3f} "
          f"devices={len(st.T.sharding.device_set)}")

    # shard_map multi-sim rollout: one sim per device, per-device trace
    # at local B=1 (the megakernel fast path per chip on TPU meshes),
    # per-sim dt (parallel/rollout.py)
    from pbml_mantle_convection_tpu.parallel.rollout import (
        rollout_batch_sharded)
    out = rollout_batch_sharded(eng, T0, 3, mesh)
    jax.block_until_ready(out.T)
    print(f"dryrun_multichip({n_devices}): shard_map per-sim rollout ok "
          f"meanT={float(out.mean_T[-1].mean()):.3f} "
          f"devices={len(out.T.sharding.device_set)}")


if __name__ == "__main__":
    import sys

    run(int(sys.argv[1]) if len(sys.argv) > 1 else 8)

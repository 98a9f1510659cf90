"""Pallas kernel vs XLA reference implementation (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from pbml_mantle_convection_tpu.ops.pallas_kernels import (
    advect_diffuse_step_pallas, fits_in_vmem)
from pbml_mantle_convection_tpu.physics.advection import (
    advect_diffuse_step, grid_metrics)
from pbml_mantle_convection_tpu.sim.grid import Grid


def test_pallas_advect_matches_xla():
    g = Grid(H=24, W=40)
    metrics = grid_metrics(g.xc, g.yc)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=(2, g.H, g.W)) * 50)
    v = jnp.asarray(rng.normal(size=(2, g.H, g.W)) * 50)
    T = jnp.asarray(rng.uniform(size=(2, g.H, g.W)))
    raq = 2.5

    T_ref, dt_ref = advect_diffuse_step(u, v, T, raq, metrics, cn_max=0.5)
    T_pal, dt_pal = advect_diffuse_step_pallas(u, v, T, raq, metrics,
                                               cn_max=0.5)
    np.testing.assert_allclose(float(dt_pal), float(dt_ref), rtol=1e-14)
    np.testing.assert_allclose(np.asarray(T_pal), np.asarray(T_ref),
                               rtol=1e-12, atol=1e-13)


def test_pallas_advect_core_cool_and_clip():
    g = Grid(H=16, W=24)
    metrics = grid_metrics(g.xc, g.yc)
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.normal(size=(1, g.H, g.W)) * 10)
    v = jnp.asarray(rng.normal(size=(1, g.H, g.W)) * 10)
    T = jnp.asarray(rng.uniform(size=(1, g.H, g.W)) * 3)  # exceeds clip

    T_pal, _ = advect_diffuse_step_pallas(u, v, T, 1.0, metrics,
                                          core_cool=True, clip_T=True)
    T_pal = np.asarray(T_pal)
    assert T_pal[:, 1:-1, 1:-1].max() <= 2.0
    # core_cool: bottom row replicates instead of being stamped to 1
    np.testing.assert_allclose(T_pal[:, 0, 1:-1], T_pal[:, 1, 1:-1],
                               atol=1e-14)


def test_vmem_fit_heuristic():
    assert fits_in_vmem(256, 256)
    assert fits_in_vmem(128, 506)
    assert not fits_in_vmem(4096, 4096)

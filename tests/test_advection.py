"""Advection–diffusion stepper vs a torch oracle of the reference ADNet."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from pbml_mantle_convection_tpu.physics.advection import (
    advect_diffuse_step, grid_metrics, stability_dt)
from pbml_mantle_convection_tpu.sim.grid import Grid


def _torch_adnet(u, v, T, raq_ra, xc, yc, dt=None, cn_max=0.1):
    """Inline torch oracle of ADNet.forward
    (pytorch_networks_convae.py:522-568)."""
    def conv(x, k):
        return F.conv2d(x, torch.tensor(k, dtype=torch.float64).view(
            1, 1, *np.shape(k)[-2:]))

    kx_l = [[-1.0, 1.0, 0.0]]
    kx_r = [[0.0, -1.0, 1.0]]
    ky_t = [[-1.0], [1.0], [0.0]]
    ky_b = [[0.0], [-1.0], [1.0]]

    u_i = u[:, :, 1:-1, 1:-1]
    v_i = v[:, :, 1:-1, 1:-1]
    xc = xc.clone()
    yc = yc.clone()
    xc[:, :, :, 0] = 0.0
    xc[:, :, :, -1] = 4.0
    yc[:, :, 0, :] = 0.0
    yc[:, :, -1, :] = 1.0

    dx_l = conv(xc, kx_l)[..., 1:-1, :]
    dx_r = conv(xc, kx_r)[..., 1:-1, :]
    dy_t = conv(yc, ky_t)[..., :, 1:-1]
    dy_b = conv(yc, ky_b)[..., :, 1:-1]

    dT_l = conv(T, kx_l)[..., 1:-1, :]
    dT_r = conv(T, kx_r)[..., 1:-1, :]
    dT_t = conv(T, ky_t)[..., :, 1:-1]
    dT_b = conv(T, ky_b)[..., :, 1:-1]

    dT_dx = (dT_l / dx_l) * (u_i > 0) + (dT_r / dx_r) * (u_i < 0)
    dT_dy = (dT_t / dy_t) * (v_i > 0) + (dT_b / dy_b) * (v_i < 0)
    T_lap = (dT_r / dx_r - dT_l / dx_l) / (0.5 * dx_r + 0.5 * dx_l) + (
        dT_b / dy_b - dT_t / dy_t) / (0.5 * dy_b + 0.5 * dy_t)

    if dt is None:
        dx_min = torch.amin(dx_l)
        uv_mag = torch.max(torch.amax(torch.abs(u_i)),
                           torch.amax(torch.abs(v_i)))
        dt_a = 0.5 * cn_max * dx_min / uv_mag
        dt_d = 0.5 * ((dx_min * dx_min) ** 2) / (dx_min**2 + dx_min**2)
        dt = torch.min(dt_a, dt_d)

    T_new = T[..., 1:-1, 1:-1] + dt * (
        -u_i * dT_dx - v_i * dT_dy + T_lap + raq_ra)
    T_new = F.pad(T_new, (1, 1, 1, 1), mode="replicate")
    T_new[:, :, 0, :] = 1.0
    T_new[:, :, -1, :] = 0.0
    return T_new, dt


def test_matches_torch_adnet():
    g = Grid(H=20, W=28)
    rng = np.random.default_rng(0)
    u = rng.normal(size=(1, g.H, g.W))
    v = rng.normal(size=(1, g.H, g.W))
    T = rng.uniform(size=(1, g.H, g.W))
    raq = 2.5

    metrics = grid_metrics(g.xc, g.yc)
    ours_T, ours_dt = advect_diffuse_step(
        jnp.asarray(u), jnp.asarray(v), jnp.asarray(T), raq, metrics,
        cn_max=0.1)

    tt = lambda a: torch.tensor(a, dtype=torch.float64).unsqueeze(1)
    xc = tt(np.asarray(g.xc)[None])
    yc = tt(np.asarray(g.yc)[None])
    ref_T, ref_dt = _torch_adnet(tt(u), tt(v), tt(T), raq, xc, yc)

    np.testing.assert_allclose(float(ours_dt), float(ref_dt), rtol=1e-14)
    np.testing.assert_allclose(np.asarray(ours_T), ref_T.numpy()[:, 0],
                               rtol=1e-12, atol=1e-13)


@pytest.mark.slow
def test_pure_diffusion_converges_to_conductive_profile():
    """With zero velocity and no heating, T must relax to the linear
    conductive profile between the Dirichlet plates."""
    g = Grid(H=18, W=26)
    metrics = grid_metrics(g.xc, g.yc)
    T = jnp.ones((1, g.H, g.W)) * 0.7
    z = jnp.zeros_like(T)
    dt = jnp.asarray(0.25 * g.dy**2)
    for _ in range(4000):
        T, _ = advect_diffuse_step(z, z, T, 0.0, metrics, dt=dt)
    expected = 1.0 - np.asarray(g.yc)
    err = np.abs(np.asarray(T[0]) - expected)[1:-1, 1:-1].max()
    assert err < 2e-3


def test_stability_dt_regimes():
    dx = 1.0 / 126.0
    # slow flow → diffusive limit
    dt = stability_dt(jnp.ones((4, 4)) * 1e-6, jnp.zeros((4, 4)), dx, 0.1)
    np.testing.assert_allclose(float(dt), 0.25 * dx * dx, rtol=1e-12)
    # fast flow → advective limit
    dt = stability_dt(jnp.ones((4, 4)) * 1e3, jnp.zeros((4, 4)), dx, 0.1)
    np.testing.assert_allclose(float(dt), 0.5 * 0.1 * dx / 1e3, rtol=1e-12)

"""Stencil ops vs the reference's conv2d formulation (torch oracle).

The oracle re-states the reference kernels (pytorch_networks_convae.py:
183-263) inline; our implementation must match them to float64 precision.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from pbml_mantle_convection_tpu.ops import stencils


def _torch_conv(x, kernel):
    k = torch.tensor(kernel, dtype=torch.float64)
    while k.ndim < 4:
        k = k.unsqueeze(0)
    t = torch.tensor(np.asarray(x), dtype=torch.float64)
    return F.conv2d(t.view(1, 1, *t.shape), k).numpy()[0, 0]


@pytest.fixture
def field():
    rng = np.random.default_rng(0)
    return rng.normal(size=(12, 17))


@pytest.mark.parametrize("op,kernel", [
    (stencils.dx_right, [[[0.0, -1.0, 1.0]]]),
    (stencils.dx_left, [[[-1.0, 1.0, 0.0]]]),
    (stencils.dx_center, [[[-0.5, 0.0, 0.5]]]),
    (stencils.dy_bot, [[[0.0], [-1.0], [1.0]]]),
    (stencils.dy_top, [[[-1.0], [1.0], [0.0]]]),
    (stencils.dy_center, [[[-0.5], [0.0], [0.5]]]),
    (stencils.du_dy, [[[1.0], [-1.0], [-1.0], [1.0]]]),
    (stencils.dv_dx, [[[1.0, -1.0, -1.0, 1.0]]]),
    (stencils.laplace, [[0.0, 1.0, 0.0], [1.0, -4.0, 1.0], [0.0, 1.0, 0.0]]),
])
def test_stencil_matches_conv(field, op, kernel):
    ours = np.asarray(op(jnp.asarray(field)))
    ref = _torch_conv(field, kernel)
    np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-14)


def test_get_mass(field):
    rng = np.random.default_rng(1)
    u = rng.normal(size=(1, 16, 20))
    v = rng.normal(size=(1, 16, 20))

    # torch oracle (pytorch_networks_convae.py:27-52)
    tu = torch.tensor(u, dtype=torch.float64).unsqueeze(1)
    tv = torch.tensor(v, dtype=torch.float64).unsqueeze(1)
    kx = torch.tensor([-0.5, 0, 0.5], dtype=torch.float64).view(1, 1, 1, 3)
    ky = torch.tensor([-0.5, 0, 0.5], dtype=torch.float64).view(1, 1, 3, 1)
    du_dx = F.conv2d(tu, kx)[..., 1:-1, :]
    dv_dy = F.conv2d(tv, ky)[..., :, 1:-1]
    ref = (du_dx + dv_dy).numpy()[:, 0]

    ours = np.asarray(stencils.get_mass(jnp.asarray(u), jnp.asarray(v)))
    np.testing.assert_allclose(ours, ref, atol=1e-14)


def test_get_mass_bc_scaling():
    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.normal(size=(14, 18)))
    v = jnp.asarray(rng.normal(size=(14, 18)))
    plain = np.asarray(stencils.get_mass(u, v))
    bc = np.asarray(stencils.get_mass(u, v, bc=True))
    # interior unchanged
    np.testing.assert_allclose(bc[1:-1, 1:-1], plain[1:-1, 1:-1], atol=1e-14)
    assert not np.allclose(bc[:, 0], plain[:, 0])


def test_pad_grad(field):
    x = jnp.asarray(field[None, None])
    out = np.asarray(stencils.pad_grad(x, (1, 1, 1, 1)))[0, 0]
    # left col extrapolates the gradient: 2*x0 - x1
    np.testing.assert_allclose(out[1:-1, 0], 2 * field[:, 0] - field[:, 1],
                               atol=1e-14)
    np.testing.assert_allclose(out[1:-1, -1], 2 * field[:, -1] - field[:, -2],
                               atol=1e-14)
    # p[2] pads the LAST row side, p[3] the first (reference quirk,
    # pytorch_networks_convae.py:75-81)
    np.testing.assert_allclose(out[-1, 1:-1], 2 * field[-1] - field[-2],
                               atol=1e-14)
    np.testing.assert_allclose(out[0, 1:-1], 2 * field[0] - field[1],
                               atol=1e-14)


def test_pad_uvp():
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.normal(size=(1, 10, 12)))
    v = jnp.asarray(rng.normal(size=(1, 10, 12)))
    p = jnp.asarray(rng.normal(size=(1, 10, 12)))
    up, vp, pp = stencils.pad_uvp(u, v, p)
    up, vp, pp = np.asarray(up), np.asarray(vp), np.asarray(pp)
    assert up.shape == (1, 12, 14)
    # u sidewalls antisymmetric
    np.testing.assert_allclose(up[0, 1:-1, 0], -np.asarray(u)[0, :, 0],
                               atol=1e-14)
    # v top/bottom antisymmetric
    np.testing.assert_allclose(vp[0, 0, 1:-1], -np.asarray(v)[0, 0, :],
                               atol=1e-14)
    # corners zeroed
    for a in (up, vp, pp):
        assert a[0, 0, 0] == 0 and a[0, -1, -1] == 0


def test_stamp_temperature_bc():
    T = jnp.asarray(np.random.default_rng(4).normal(size=(6, 8)))
    out = np.asarray(stencils.stamp_temperature_bc(T))
    assert np.all(out[0] == 1.0) and np.all(out[-1] == 0.0)
    np.testing.assert_allclose(out[:, 0], out[:, 1], atol=1e-14)
    # core-cool leaves the bottom row free (advect_wi_gaia.py:624-625)
    out2 = np.asarray(stencils.stamp_temperature_bc(T, core_cool=True))
    np.testing.assert_allclose(out2[0, 1:-1], np.asarray(T)[0, 1:-1],
                               atol=1e-14)

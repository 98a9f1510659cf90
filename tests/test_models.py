"""Model-level tests: shapes, curl-head divergence-freeness, head variants."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pbml_mantle_convection_tpu.models import (
    ConvAE, FluidNet, MultiScaleNewFluidNet, NewFluidNet, Unet)
from pbml_mantle_convection_tpu.ops.stencils import get_mass

H, W = 32, 68  # small grid with the same odd-size behaviour as 128x506


def _rand_input(c, seed=0, h=H, w=W):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(2, h, w, c)))


class TestNewFluidNet:
    @pytest.mark.parametrize("r_p", ["zeros", "replicate", "learned"])
    def test_curl_shapes_and_divergence(self, r_p):
        m = NewFluidNet(levels=3, c_i=7, c_h=8, c_o=2, r_p=r_p,
                        loss_type="curl", f=5, repeats=2, p_pred=True)
        x = _rand_input(7)
        params = m.init(jax.random.PRNGKey(0), x)
        u, v, p = m.apply(params, x)
        assert u.shape == (2, H, W) and v.shape == (2, H, W)
        assert p.shape == (2, H, W)
        # interior divergence of the curl head must vanish to roundoff
        mass = np.asarray(get_mass(u, v))
        assert np.max(np.abs(mass[:, 1:-1, 1:-1])) < 1e-12

    def test_mae_head(self):
        m = NewFluidNet(levels=2, c_i=7, c_h=8, c_o=3, loss_type="mae",
                        repeats=1, p_pred=True)
        x = _rand_input(7)
        params = m.init(jax.random.PRNGKey(0), x)
        u, v, p = m.apply(params, x)
        assert u.shape == (2, H, W) and p.shape == (2, H, W)

    def test_no_p(self):
        m = NewFluidNet(levels=2, c_i=7, c_h=8, c_o=1, loss_type="curl",
                        repeats=1, p_pred=False)
        x = _rand_input(7)
        params = m.init(jax.random.PRNGKey(0), x)
        u, v, p = m.apply(params, x)
        assert p is None

    @pytest.mark.slow
    def test_symm_spectral_variants(self):
        for kw in ({"use_symm": True}, {"spectral_conv": True}):
            m = NewFluidNet(levels=2, c_i=7, c_h=8, c_o=1, loss_type="curl",
                            repeats=1, p_pred=False, **kw)
            x = _rand_input(7)
            params = m.init(jax.random.PRNGKey(0), x)
            u, v, _ = m.apply(params, x)
            assert u.shape == (2, H, W)


class TestFluidNet:
    @pytest.mark.parametrize("r_p", ["zeros", "learned"])
    def test_curl_grows_then_crops(self, r_p):
        m = FluidNet(levels=2, c_i=7, c_h=8, c_o=2, r_p=r_p,
                     loss_type="curl", f=5, repeats=1, p_pred=True)
        x = _rand_input(7)
        params = m.init(jax.random.PRNGKey(0), x)
        u, v, p = m.apply(params, x)
        # cropped head: full (H, W) without BC stamping
        assert u.shape == (2, H, W) and v.shape == (2, H, W)
        # p lives on the extended grid (H+2, W+2) in this variant
        assert p.shape == (2, H + 2, W + 2)
        mass = np.asarray(get_mass(u, v))
        assert np.max(np.abs(mass)) < 1e-12


class TestUnet:
    @pytest.mark.parametrize("r_p", [
        pytest.param("replicate", marks=pytest.mark.slow), "learned"])
    def test_curl_uvpt(self, r_p):
        m = Unet(levels=3, c_i=10, c_h=8, c_o=2, r_p=r_p, loss_type="curl",
                 f=5, repeats=2, p_pred=False)
        x = _rand_input(10)
        params = m.init(jax.random.PRNGKey(0), x)
        u, v, p, T = m.apply(params, x)
        assert u.shape == (2, H, W) and T.shape == (2, H, W)
        assert p is None
        assert float(jnp.max(T)) <= 1.5 and float(jnp.min(T)) >= 0.0
        mass = np.asarray(get_mass(u, v))
        assert np.max(np.abs(mass[:, 1:-1, 1:-1])) < 1e-12

    def test_channel_doubling_param_structure(self):
        m = Unet(levels=3, c_i=10, c_h=8, c_o=2, p_pred=False)
        x = _rand_input(10)
        params = m.init(jax.random.PRNGKey(0), x)["params"]
        # level-2 encoder layer r=0 maps c_h→2c_h
        k = params["convs_1_0"]["conv"]["kernel"]
        assert k.shape[-2:] == (8, 16)


class TestConvAE:
    @pytest.mark.slow
    def test_curl_output(self):
        m = ConvAE(levels=2, c_i=3, c_h=4, c_o=3, loss_type="curl",
                   repeats=1, p_pred=True)
        x = _rand_input(3, h=64, w=68)
        params = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(params, x)
        # channels: (c_o - 2 passthrough) + u + v + p slot
        assert y.shape == (2, 64, 68, 4)


class TestMultiScale:
    def test_runs_and_divfree(self):
        m = MultiScaleNewFluidNet(levels=2, c_i=7, c_h=8, c_o=1,
                                  scales=(1e-4, 1e-1), loss_type="curl",
                                  repeats=1, p_pred=False)
        x = _rand_input(7)
        params = m.init(jax.random.PRNGKey(0), x)
        u, v, p = m.apply(params, x)
        assert u.shape == (2, H, W)
        mass = np.asarray(get_mass(u, v))
        assert np.max(np.abs(mass[:, 1:-1, 1:-1])) < 1e-12

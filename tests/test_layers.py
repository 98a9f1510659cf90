"""Layer-level tests: symmetric convs, boundary-learned convs, FluidLayer,
spectral convs."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from pbml_mantle_convection_tpu.models.layers import (
    BoundaryLearnedConvolution2D, Conv2dTorch, FluidLayer, SpectralConv2d,
    SymmetricConv2d)


def _init_apply(module, x, seed=0):
    params = module.init(jax.random.PRNGKey(seed), x)
    return params, module.apply(params, x)


class TestSymmetricConv:
    def test_unique_channel_count(self):
        assert SymmetricConv2d.unique_out_channels(16, {"h": 4}) == 14
        assert SymmetricConv2d.unique_out_channels(16, {"h": 4, "v": 2}) == 13
        assert SymmetricConv2d.unique_out_channels(16, {"hv": 8}) == 10

    def test_materialized_weight_structure(self):
        """The h-symmetric output pair must be x-mirrored copies: feeding a
        delta image, channel c and its mirror partner must be flips."""
        m = SymmetricConv2d(4, 3, symmetry={"h": 4}, use_bias=False,
                            padding="VALID")
        x = jnp.zeros((1, 7, 7, 1)).at[0, 3, 3, 0].set(1.0)
        params = m.init(jax.random.PRNGKey(0), x)
        y = np.asarray(m.apply(params, x))  # (1,5,5,4)
        # unique order: [w0, w1, flip(w0), flip(w1)] → pairs (0,2), (1,3)
        np.testing.assert_allclose(y[0, :, :, 2], y[0, :, ::-1, 0],
                                   atol=1e-14)
        np.testing.assert_allclose(y[0, :, :, 3], y[0, :, ::-1, 1],
                                   atol=1e-14)

    def test_equivariance_under_x_flip(self):
        """With all filters in h-pairs, flipping the input in x permutes the
        output channels within each pair (and flips it in x)."""
        m = SymmetricConv2d(4, 3, symmetry={"h": 4}, use_bias=False,
                            padding="VALID")
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(1, 9, 9, 2)))
        params = m.init(jax.random.PRNGKey(1), x)
        y = np.asarray(m.apply(params, x))
        yf = np.asarray(m.apply(params, x[:, :, ::-1, :]))
        perm = [2, 3, 0, 1]
        np.testing.assert_allclose(yf[..., perm], y[:, :, ::-1, :],
                                   atol=1e-12)

    def test_param_count_smaller(self):
        plain = Conv2dTorch(16, 3, use_bias=False)
        symm = SymmetricConv2d(16, 3, symmetry={"h": 4}, use_bias=False)
        x = jnp.zeros((1, 8, 8, 4))
        n_plain = sum(p.size for p in jax.tree.leaves(
            plain.init(jax.random.PRNGKey(0), x)))
        n_symm = sum(p.size for p in jax.tree.leaves(
            symm.init(jax.random.PRNGKey(0), x)))
        assert n_symm == n_plain * 14 // 16


class TestConv2dTorch:
    @pytest.mark.parametrize("pad_mode", ["constant", "replicate"])
    def test_matches_torch_conv(self, pad_mode):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(1, 10, 12, 3))
        m = Conv2dTorch(5, 3, padding="SAME", pad_mode=pad_mode)
        params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
        kernel = np.asarray(params["params"]["kernel"])  # HWIO
        bias = np.asarray(params["params"]["bias"])

        tx = torch.tensor(x.transpose(0, 3, 1, 2), dtype=torch.float64)
        tw = torch.tensor(kernel.transpose(3, 2, 0, 1), dtype=torch.float64)
        tb = torch.tensor(bias, dtype=torch.float64)
        tmode = "constant" if pad_mode == "constant" else "replicate"
        txp = F.pad(tx, (1, 1, 1, 1), mode=tmode)
        ref = F.conv2d(txp, tw, tb).numpy()

        ours = np.asarray(m.apply(params, jnp.asarray(x)))
        np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref,
                                   rtol=1e-12, atol=1e-12)


class TestBoundaryLearnedConv:
    @pytest.mark.parametrize("k", [3, 5])
    def test_shape_preserving(self, k):
        m = BoundaryLearnedConvolution2D(8, k)
        x = jnp.zeros((2, 32, 40, 4))
        _, y = _init_apply(m, x)
        assert y.shape == (2, 32, 40, 8)

    def test_bc2_growth(self):
        """bc_x=bc_y=2 grows the output by 2 in each spatial dim
        (FluidNet curl path, pytorch_networks_convae.py:1659-1660)."""
        m = BoundaryLearnedConvolution2D(8, 5, bc_x=2, bc_y=2)
        x = jnp.zeros((1, 32, 40, 4))
        _, y = _init_apply(m, x)
        assert y.shape == (1, 34, 42, 8)

    def test_bc_x4_growth(self):
        """bc_x=4 grows W by 6 (Unet learned first layer,
        pytorch_networks_convae.py:1994-1995)."""
        m = BoundaryLearnedConvolution2D(8, 5, bc_x=4, bc_y=1)
        x = jnp.zeros((1, 32, 40, 4))
        _, y = _init_apply(m, x)
        assert y.shape == (1, 32, 46, 8)

    def test_boundary_band_differs_from_plain_conv(self):
        """Edge bands use different filters than the interior."""
        m = BoundaryLearnedConvolution2D(4, 3)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(1, 20, 24, 2)))
        params, y = _init_apply(m, x)
        # interior rows must equal the plain interior conv result there
        kernel = params["params"]["conv"]["kernel"]
        from pbml_mantle_convection_tpu.models.layers import conv2d_nhwc
        inner = conv2d_nhwc(x, kernel)
        pad = 3  # k=3, bc=1
        band = pad - 2  # rows of each boundary band in the output
        np.testing.assert_allclose(
            np.asarray(y)[:, band:-band, band:-band, :],
            np.asarray(inner) + np.asarray(
                params["params"]["learnable_bias"]),
            atol=1e-12)


class TestFluidLayer:
    @pytest.mark.parametrize("r_p", ["zeros", "replicate", "learned"])
    @pytest.mark.parametrize("use_symm", [False, True])
    def test_shapes(self, r_p, use_symm):
        m = FluidLayer(8, act_fn="gelu", r_p=r_p, use_symm=use_symm,
                       kernel_size=5)
        x = jnp.zeros((2, 24, 30, 4))
        _, y = _init_apply(m, x)
        assert y.shape == (2, 24, 30, 8)


class TestSpectralConv:
    def test_matches_torch_fno(self):
        """Our rFFT2 mode mixing == the reference einsum path."""
        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 4, 16, 18))  # NCHW
        m = SpectralConv2d(6)
        params = m.init(jax.random.PRNGKey(0),
                        jnp.asarray(x.transpose(0, 2, 3, 1)))
        p = params["params"]
        w1 = np.asarray(p["weights1_real"]) + 1j * np.asarray(
            p["weights1_imag"])
        w2 = np.asarray(p["weights2_real"]) + 1j * np.asarray(
            p["weights2_imag"])

        tx = torch.tensor(x, dtype=torch.float64)
        x_ft = torch.fft.rfft2(tx)
        out_ft = torch.zeros(2, 6, 16, 10, dtype=torch.cdouble)
        tw1 = torch.tensor(w1)
        tw2 = torch.tensor(w2)
        out_ft[:, :, :4, :4] = torch.einsum(
            "bixy,ioxy->boxy", x_ft[:, :, :4, :4], tw1)
        out_ft[:, :, -4:, :4] = torch.einsum(
            "bixy,ioxy->boxy", x_ft[:, :, -4:, :4], tw2)
        ref = torch.fft.irfft2(out_ft, s=(16, 18)).numpy()

        ours = np.asarray(m.apply(params, jnp.asarray(
            x.transpose(0, 2, 3, 1)))).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-10)


class TestSymmetricConv3d:
    def test_unique_channels(self):
        from pbml_mantle_convection_tpu.models.layers import SymmetricConv3d
        assert SymmetricConv3d.unique_out_channels(
            16, {"h": 4, "z": 2, "hv": 8}) == 16 - 2 - 1 - 6
        assert SymmetricConv3d.unique_out_channels(16, {"hvz": 8}) == 9

    def test_forward_and_mirror_structure(self):
        from pbml_mantle_convection_tpu.models.layers import SymmetricConv3d
        m = SymmetricConv3d(4, 3, symmetry={"h": 4}, use_bias=False)
        x = jnp.zeros((1, 5, 7, 7, 1)).at[0, 2, 3, 3, 0].set(1.0)
        params = m.init(jax.random.PRNGKey(0), x)
        y = np.asarray(m.apply(params, x))
        assert y.shape == (1, 5, 7, 7, 4)
        # h-pair (0,2): mirrored along the W axis
        np.testing.assert_allclose(y[0, :, :, :, 2], y[0, :, :, ::-1, 0],
                                   atol=1e-14)

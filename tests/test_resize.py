"""Resize/pool ops vs torch oracles (bicubic Upsample, AvgPool2d)."""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from pbml_mantle_convection_tpu.ops.resize import (
    avg_pool_nhwc, resize_bicubic_nhwc, resize_bilinear_nhwc)


@pytest.mark.parametrize("in_hw,out_hw", [
    ((16, 63), (32, 126)),
    ((8, 31), (128, 506)),
    ((64, 253), (128, 506)),
    ((20, 20), (10, 15)),
])
def test_bicubic_matches_torch(in_hw, out_hw):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, *in_hw))  # NCHW for torch
    ref = torch.nn.Upsample(size=out_hw, mode="bicubic")(
        torch.tensor(x, dtype=torch.float64)).numpy()
    ours = np.asarray(resize_bicubic_nhwc(
        jnp.asarray(x.transpose(0, 2, 3, 1)), out_hw))
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref,
                               rtol=1e-12, atol=1e-12)


def test_bilinear_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 1, 32, 506))
    ref = torch.nn.Upsample(scale_factor=(4, 1), mode="bilinear")(
        torch.tensor(x, dtype=torch.float64)).numpy()
    ours = np.asarray(resize_bilinear_nhwc(
        jnp.asarray(x.transpose(0, 2, 3, 1)), (128, 506)))
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref,
                               rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("hw,factor", [((128, 506), 2), ((63, 253), 2),
                                       ((128, 506), 4)])
def test_avg_pool_matches_torch(hw, factor):
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 3, *hw))
    ref = torch.nn.AvgPool2d((factor, factor), stride=factor)(
        torch.tensor(x, dtype=torch.float64)).numpy()
    ours = np.asarray(avg_pool_nhwc(
        jnp.asarray(x.transpose(0, 2, 3, 1)), factor))
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref,
                               rtol=1e-12, atol=1e-12)


def test_bicubic_scale_factor4_exact():
    """On x4-divisible grids the size-targeted resize is identical to the
    reference ConvAE decoder's Upsample(scale_factor=4, mode='bicubic')
    (pycold-checkpoint.py:1074) — the documented shape generalization is
    a strict superset, not a numeric deviation."""
    rng = np.random.default_rng(7)
    x = rng.normal(size=(1, 2, 8, 12))
    ref = torch.nn.Upsample(scale_factor=4, mode="bicubic")(
        torch.tensor(x, dtype=torch.float64)).numpy()
    got = resize_bicubic_nhwc(jnp.asarray(np.moveaxis(x, 1, -1)), (32, 48))
    np.testing.assert_allclose(np.moveaxis(np.asarray(got), -1, 1), ref,
                               rtol=1e-12, atol=1e-12)

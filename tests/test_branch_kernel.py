"""Megakernel (ops/branch_kernel.py) exactness vs the Flax FluidLayer.

Runs the Pallas kernel in interpreter mode on CPU (fr=2 x fc=4 block layout) and requires the whole
stack output to match sequentially-applied FluidLayers to float32
round-off (the same standard as tests/test_fast_path.py).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pbml_mantle_convection_tpu.models.layers import (
    FluidLayer, get_activation)
from pbml_mantle_convection_tpu.ops.branch_kernel import LayerStack
from pbml_mantle_convection_tpu.ops.s2d import (
    depth_to_space_rect, space_to_depth_rect)


def _layer_dict(tree, learned):
    conv = tree["conv"]
    d = {
        "gn_scale": np.asarray(tree["gn"]["GroupNorm_0"]["scale"],
                               np.float32),
        "gn_bias": np.asarray(tree["gn"]["GroupNorm_0"]["bias"],
                              np.float32),
    }
    if learned:
        d["w"] = np.asarray(conv["conv"]["kernel"], np.float32)
        d["bias"] = np.asarray(conv["learnable_bias"],
                               np.float32)[0, 0, 0]
        for nm in ("conv_top", "conv_bottom", "conv_left", "conv_right",
                   "conv_top_left", "conv_top_right", "conv_bottom_left",
                   "conv_bottom_right"):
            d[nm] = np.asarray(conv[nm]["kernel"], np.float32)
    else:
        d["w"] = np.asarray(conv["kernel"], np.float32)
        d["bias"] = np.asarray(conv["bias"], np.float32)
    return d


@pytest.mark.parametrize("r_p", ["learned", "zeros"])
@pytest.mark.parametrize("shape", [
    (16, 24), pytest.param((16, 16), marks=pytest.mark.slow)])
def test_stack_matches_fluid_layers(r_p, shape):
    H, W = shape
    k, C = 5, 16
    R = 3
    learned = r_p == "learned"

    layers = [FluidLayer(features=C, act_fn="gelu", r_p=r_p,
                         kernel_size=k, dtype=jnp.float32)
              for _ in range(R)]
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, H, W, C), jnp.float32)

    params = []
    ref = x
    for i, lay in enumerate(layers):
        p = lay.init(jax.random.PRNGKey(i + 1), ref)
        ref = lay.apply(p, ref)
        params.append(p["params"])
    ref = np.asarray(ref[0])

    stack = LayerStack(
        [_layer_dict(p, learned) for p in params], H, W, k,
        act=get_activation("gelu"), learned=learned, interpret=True)
    x6 = space_to_depth_rect(x, 2, 4)[0]
    out6 = stack(x6)
    out = np.asarray(depth_to_space_rect(out6[None], 2, 4, C)[0])

    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_erf_poly_matches_lax_erf():
    """The in-kernel erf (XLA's own f32 rational polynomial) must agree
    with lax.erf at float32 ulp level — the exact-GELU path on TPU."""
    from jax import lax
    from pbml_mantle_convection_tpu.ops.branch_kernel import (
        erf_poly, gelu_erf_kernel)

    x = jnp.asarray(np.linspace(-6, 6, 20001), jnp.float32)
    d = np.abs(np.asarray(erf_poly(x)) - np.asarray(lax.erf(x)))
    assert d.max() < 1e-6
    g = np.abs(np.asarray(gelu_erf_kernel(x))
               - np.asarray(jax.nn.gelu(x, approximate=False)))
    assert g.max() < 2e-6


def test_stem_stack_cin_ne_cout():
    """Single-layer stack with C_in != C_out (the stem)."""
    H, W, k = 16, 32, 5
    lay = FluidLayer(features=16, act_fn="gelu", r_p="learned",
                     kernel_size=k, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, H, W, 7),
                          jnp.float32)
    p = lay.init(jax.random.PRNGKey(4), x)
    ref = np.asarray(lay.apply(p, x)[0])

    stack = LayerStack([_layer_dict(p["params"], True)], H, W, k,
                       act=get_activation("gelu"), learned=True,
                       interpret=True)
    out6 = stack(space_to_depth_rect(x, 2, 4)[0])
    out = np.asarray(depth_to_space_rect(out6[None], 2, 4, 16)[0])
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("r_p", ["learned", "zeros"])
@pytest.mark.parametrize("W", [
    18, pytest.param(19, marks=pytest.mark.slow),
    pytest.param(21, marks=pytest.mark.slow)])   # w_rem = 2, 3, 1
def test_stack_ragged_width(r_p, W):
    """Non-4-divisible widths run on a ragged last block column
    (_ragged_plan): pad lane groups stay exact zeros, GroupNorm
    statistics count only the valid W columns, and the right-edge
    bands/corners use per-eval folded weights + target lane masks."""
    H, k, C = 12, 5, 16
    R = 2
    learned = r_p == "learned"
    layers = [FluidLayer(features=C, act_fn="gelu", r_p=r_p,
                         kernel_size=k, dtype=jnp.float32)
              for _ in range(R)]
    x = jax.random.normal(jax.random.PRNGKey(0), (1, H, W, C),
                          jnp.float32)
    params = []
    ref = x
    for i, lay in enumerate(layers):
        p = lay.init(jax.random.PRNGKey(i + 1), ref)
        ref = lay.apply(p, ref)
        params.append(p["params"])
    ref = np.asarray(ref[0])

    stack = LayerStack(
        [_layer_dict(p, learned) for p in params], H, W, k,
        act=get_activation("gelu"), learned=learned, interpret=True)
    wc = -(-W // 4)
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, wc * 4 - W), (0, 0)))
    x6 = space_to_depth_rect(xp, 2, 4)[0]
    out6 = stack(x6)
    dense = np.asarray(depth_to_space_rect(out6[None], 2, 4, C)[0])
    np.testing.assert_allclose(dense[:, :W], ref, rtol=2e-5, atol=2e-5)
    # pad cols carry exact zeros (the stored-field invariant)
    np.testing.assert_array_equal(dense[:, W:], 0.0)


@pytest.mark.parametrize("W", [
    18, pytest.param(21, marks=pytest.mark.slow)])  # pooled width 9 ragged
def test_stack_ragged_pool(W):
    """The in-kernel factor-2 pool on a ragged width follows the torch
    floor semantics (trailing odd col dropped) and keeps the pooled
    pad lanes exactly zero."""
    from pbml_mantle_convection_tpu.ops.resize import avg_pool_nhwc

    H, k, C = 12, 5, 16
    lay = FluidLayer(features=C, act_fn="gelu", r_p="learned",
                     kernel_size=k, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(5), (1, H, W, C),
                          jnp.float32)
    p = lay.init(jax.random.PRNGKey(6), x)

    stack = LayerStack([_layer_dict(p["params"], True)], H, W, k,
                       act=get_activation("gelu"), learned=True,
                       interpret=True, pool=True)
    wc = -(-W // 4)
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, wc * 4 - W), (0, 0)))
    xh = stack.prep(space_to_depth_rect(xp, 2, 4)[0])
    _, pooled_h = stack.call_raw(xh)
    H2, W2 = H // 2, W // 2
    hr2, wc2 = H2 // 2, -(-W2 // 4)
    pooled6 = pooled_h[1:hr2 + 1, 1:wc2 + 1, :8 * C]
    dense = np.asarray(depth_to_space_rect(pooled6[None], 2, 4, C)[0])
    ref = np.asarray(avg_pool_nhwc(x, 2)[0])
    np.testing.assert_allclose(dense[:, :W2], ref, rtol=2e-6, atol=2e-6)
    np.testing.assert_array_equal(dense[:, W2:], 0.0)

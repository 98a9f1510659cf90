"""Fused Pallas slice attention vs the XLA einsum formulation."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pbml_mantle_convection_tpu.ops.slice_attention import (
    slice_attention_fused)


def _xla_reference(fx_mid, x_mid, ws, bs, temperature, wq, wk, wv):
    """models/transolver.py:_slice_attention semantics, inlined."""
    logits = (x_mid @ ws + bs) / temperature
    w = jax.nn.softmax(logits, axis=-1)
    num = jnp.einsum("bhnc,bhng->bhgc", fx_mid, w)
    den = jnp.sum(w, axis=2)
    token = num / (den[..., None] + 1e-5)
    q = token @ wq
    k = token @ wk
    v = token @ wv
    D = fx_mid.shape[-1]
    attn = jax.nn.softmax(
        jnp.einsum("bhgc,bhfc->bhgf", q, k) * D ** -0.5, axis=-1)
    out_tok = jnp.einsum("bhgf,bhfc->bhgc", attn, v)
    return jnp.einsum("bhgc,bhng->bhnc", out_tok, w)


@pytest.mark.parametrize("N,block_n", [(256, 64), (200, 64), (64, 64)])
def test_fused_matches_xla(N, block_n):
    rng = np.random.default_rng(0)
    B, H, D, G = 2, 3, 8, 16
    fx = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.float32)
    xm = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.float32)
    ws = jnp.asarray(rng.normal(size=(D, G)), jnp.float32) * 0.3
    bs = jnp.asarray(rng.normal(size=(G,)), jnp.float32) * 0.1
    temp = jnp.asarray(0.4 + 0.2 * rng.random((1, H, 1, 1)), jnp.float32)
    wq = jnp.asarray(rng.normal(size=(D, D)), jnp.float32) * 0.3
    wk = jnp.asarray(rng.normal(size=(D, D)), jnp.float32) * 0.3
    wv = jnp.asarray(rng.normal(size=(D, D)), jnp.float32) * 0.3

    ref = _xla_reference(fx, xm, ws, bs, temp, wq, wk, wv)
    out = slice_attention_fused(fx, xm, ws, bs, temp, wq, wk, wv,
                                block_n=block_n)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)

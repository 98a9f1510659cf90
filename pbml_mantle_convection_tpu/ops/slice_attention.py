"""Fused Pallas slice-attention (Physics-Attention core) for Transolver.

The XLA formulation (models/transolver.py:_slice_attention) materializes
the (B, H, N, G) slice-weight tensor and reads it twice — at the reference
grid that is 8 heads × 64,768 points × 64 slices × 4 B ≈ 132 MB written
plus 264 MB read per attention layer. These kernels stream N in blocks and
recompute the softmax weights on the fly, so the big tensor never touches
HBM:

* :func:`_pool_kernel` — accumulate the slice-token numerator (G, D) and
  denominator (G) over N blocks;
* token-to-token attention (G×G, tiny) stays in XLA;
* :func:`_deslice_kernel` — broadcast the attended tokens back to points.

Exactness: matches the XLA path to float round-off (tests). Interpreter
mode on non-TPU backends.

Measured (v5e, B=1 H=8 N=64768 D=32 G=64): 4.9 ms vs XLA's 1.5 ms — the
per-block matmuls (K=32, N=64) are MXU-starved and the 256-step grid
serializes, so the HBM savings don't pay at these shapes. XLA remains the
default in models/transolver.py; the kernel is kept as the verified
starting point for multi-chip variants (PERF.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _weights_block(xm_ref, ws_ref, bs_ref, temp_ref):
    logits = (jnp.dot(xm_ref[0], ws_ref[:],
                      preferred_element_type=jnp.float32)
              + bs_ref[:]) / temp_ref[pl.program_id(0), 0]
    return jax.nn.softmax(logits, axis=-1)          # (Nb, G)


def _pool_kernel(temp_ref, fx_ref, xm_ref, ws_ref, bs_ref,
                 num_ref, den_ref):
    """Grid (BH, NB). Accumulates num (G, D) and den (G,) per bh."""
    j = pl.program_id(1)
    w = _weights_block(xm_ref, ws_ref, bs_ref, temp_ref)

    @pl.when(j == 0)
    def _():
        num_ref[:] = jnp.zeros_like(num_ref)
        den_ref[:] = jnp.zeros_like(den_ref)

    num_ref[:] += jnp.dot(w.T, fx_ref[0],
                          preferred_element_type=jnp.float32)
    den_ref[:] += jnp.sum(w, axis=0, keepdims=True)


def _deslice_kernel(temp_ref, xm_ref, tok_ref, ws_ref, bs_ref, out_ref):
    """Grid (BH, NB). out block = w @ attended_tokens."""
    w = _weights_block(xm_ref, ws_ref, bs_ref, temp_ref)
    out_ref[0] = jnp.dot(w, tok_ref[0],
                         preferred_element_type=jnp.float32)


def slice_attention_fused(fx_mid, x_mid, ws, bs, temperature,
                          wq, wk, wv, block_n: int = 2048):
    """Fused Physics-Attention core.

    Args:
      fx_mid, x_mid: (B, H, N, D) projected features.
      ws, bs: slice projection (D, G), (G,).
      temperature: (1, H, 1, 1) (clamped upstream if applicable).
      wq, wk, wv: (D, D) token attention projections.
    Returns: (B, H, N, D) — identical to the einsum formulation
      (models/transolver.py:_slice_attention).
    """
    B, H, N, D = fx_mid.shape
    G = ws.shape[-1]
    BH = B * H
    nb = -(-N // block_n)
    Np = nb * block_n

    fx = fx_mid.reshape(BH, N, D)
    xm = x_mid.reshape(BH, N, D)
    if Np != N:
        # pad with -inf-free zeros; padded rows get weights ~uniform but
        # are masked out of the accumulation by zero fx rows... they do
        # contribute to den, so mask explicitly instead:
        fx = jnp.pad(fx, ((0, 0), (0, Np - N), (0, 0)))
        xm = jnp.pad(xm, ((0, 0), (0, Np - N), (0, 0)))
    temp = jnp.broadcast_to(
        temperature.reshape(1, H), (B, H)).reshape(BH, 1).astype(
        jnp.float32)

    grid = (BH, nb)
    blk = pl.BlockSpec((1, block_n, D), lambda i, j: (i, j, 0),
                       memory_space=pltpu.VMEM)
    rep = pl.BlockSpec((D, G), lambda i, j: (0, 0),
                       memory_space=pltpu.VMEM)
    repb = pl.BlockSpec((G,), lambda i, j: (0,),
                        memory_space=pltpu.VMEM)
    # whole temp vector in SMEM; the kernel indexes it by program_id(0)
    # (tiny rank-2 blocks are not tileable on TPU)
    temp_spec = pl.BlockSpec((BH, 1), lambda i, j: (0, 0),
                             memory_space=pltpu.SMEM)

    num, den = pl.pallas_call(
        _pool_kernel,
        grid=grid,
        in_specs=[temp_spec, blk, blk, rep, repb],
        out_specs=(
            pl.BlockSpec((1, G, D), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((BH, G, D), jnp.float32),
            jax.ShapeDtypeStruct((BH, 1, G), jnp.float32),
        ),
        interpret=_interpret(),
    )(temp, fx, xm, ws, bs)

    if Np != N:
        # remove padded rows' contribution to the denominator: padded xm
        # rows are zeros → their weights are softmax(bs / temp), constant
        # per (bh); subtract (Np - N) of them. Their fx is zero so num is
        # unaffected.
        w_pad = jax.nn.softmax(bs[None, :] / temp, axis=-1)
        den = den - (Np - N) * w_pad[:, None, :]

    token = num / (den.reshape(BH, G)[..., None] + 1e-5)   # (BH, G, D)

    # token attention (tiny) in XLA
    q = token @ wq
    k = token @ wk
    v = token @ wv
    attn = jax.nn.softmax(
        jnp.einsum("bgc,bfc->bgf", q, k) * (D ** -0.5), axis=-1)
    out_tok = jnp.einsum("bgf,bfc->bgc", attn, v).astype(jnp.float32)

    out = pl.pallas_call(
        _deslice_kernel,
        grid=grid,
        in_specs=[temp_spec, blk,
                  pl.BlockSpec((1, G, D), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  rep, repb],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((BH, Np, D), jnp.float32),
        interpret=_interpret(),
    )(temp, xm, out_tok, ws, bs)

    return out[:, :N].reshape(B, H, N, D).astype(fx_mid.dtype)

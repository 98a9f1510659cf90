"""Space-to-depth convolution: full-MXU execution of small-channel convs.

The surrogates' convolutions have 7-16 channels — an intrinsic ~12% MXU
lane utilization on TPU (the systolic array is 128 wide). Re-indexing the
field into f×f blocks turns a K×K conv over C channels into an equivalent
(smaller-K) conv over C·f² channels: with f=4 a 5×5/16-channel conv becomes
a 3×3/256-channel conv — full lanes, measured 3.3× faster end-to-end for
the flagship conv chain despite the 7× nominal FLOP increase (the scattered
block weights contain zeros).

The transformation is exact: ``conv_s2d(s2d(x), s2d_conv_weights(w)) ==
s2d(conv_SAME_zeropad(x, w))`` bit-for-bit up to dot-product summation
order.

Channel layout: ``s2d(x)[..., i, j, (a*f + b)*C + c] = x[..., i*f + a,
j*f + b, c]``.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp
from jax import lax


def space_to_depth(x, f: int):
    """(B, H, W, C) → (B, H/f, W/f, f*f*C). H, W must divide by f."""
    B, H, W, C = x.shape
    h, w = H // f, W // f
    x = x.reshape(B, h, f, w, f, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, h, w, f * f * C)


def depth_to_space(x, f: int, C: int):
    """Inverse of :func:`space_to_depth`."""
    B, h, w, _ = x.shape
    x = x.reshape(B, h, w, f, f, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, h * f, w * f, C)


@functools.lru_cache(maxsize=None)
def _s2d_scatter_indices(K: int, fr: int, fc: int) -> Tuple:
    pad = (K - 1) // 2
    half_r = (pad + fr - 1) // fr
    half_c = (pad + fc - 1) // fc
    entries = []
    for a in range(fr):
        for b in range(fc):
            for dy in range(K):
                for dx in range(K):
                    yy = a + dy - pad
                    xx = b + dx - pad
                    p, aa = divmod(yy, fr)
                    q, bb = divmod(xx, fc)
                    entries.append((p + half_r, q + half_c, aa * fc + bb,
                                    a * fc + b, dy, dx))
    return 1 + 2 * half_r, 1 + 2 * half_c, tuple(entries)


def s2d_conv_weights(w, f: int):
    """Transform an HWIO kernel (K, K, Ci, Co) into the equivalent s2d
    kernel (Kp, Kp, f²·Ci, f²·Co) for a zero-padded SAME conv."""
    return s2d_conv_weights_rect(w, f, f)


def s2d_conv_weights_rect(w, fr: int, fc: int):
    """Rectangular-block variant: (K, K, Ci, Co) HWIO → the equivalent
    (Kp_r, Kp_c, fr·fc·Ci, fr·fc·Co) kernel on the fr×fc block layout
    (lane size fr·fc·C — e.g. fr=2, fc=4 puts 8·C channels on lanes,
    full 128-wide MXU at C=16 while keeping 2-dense-row bands on whole
    block rows; see ops/branch_kernel.py)."""
    w = np.asarray(w)
    K, _, Ci, Co = w.shape
    Kp_r, Kp_c, entries = _s2d_scatter_indices(K, fr, fc)
    w2 = np.zeros((Kp_r, Kp_c, fr * fc * Ci, fr * fc * Co),
                  dtype=w.dtype)
    for (P, Q, blk_in, blk_out, dy, dx) in entries:
        w2[P, Q, blk_in * Ci:(blk_in + 1) * Ci,
           blk_out * Co:(blk_out + 1) * Co] += w[dy, dx]
    return w2


def space_to_depth_rect(x, fr: int, fc: int):
    """(B, H, W, C) → (B, H/fr, W/fc, fr·fc·C)."""
    B, H, W, C = x.shape
    h, w = H // fr, W // fc
    x = x.reshape(B, h, fr, w, fc, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, h, w, fr * fc * C)


def space_to_depth_rect_sliced(x, fr: int, fc: int):
    """Same permutation as :func:`space_to_depth_rect`, lowered as a
    minor-dims reshape + ``fr`` strided row slices + one lane concat.

    On TPU this avoids the 6-D transpose copy — measurably cheaper for
    few-channel inputs (tools/microbench_s2d.py); bitwise identical:
    lane ``(r·fc + b)·C + c`` receives ``x[:, fr·i + r, fc·j + b, c]``
    in both forms.
    """
    B, H, W, C = x.shape
    x2 = x.reshape(B, H, W // fc, fc * C)
    return jnp.concatenate([x2[:, r::fr] for r in range(fr)], axis=-1)


def depth_to_space_rect(x, fr: int, fc: int, C: int):
    """Inverse of :func:`space_to_depth_rect`."""
    B, h, w, _ = x.shape
    x = x.reshape(B, h, w, fr, fc, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, h * fr, w * fc, C)


@functools.lru_cache(maxsize=None)
def _pool_lane_mats(c: int, fr: int = 2, fc: int = 4):
    """Lane-mixing matrices for :func:`avg_pool_rect`: the factor-2 mean
    pool in fr=2 × fc=4 block layout is 4 block-parity slices times 0/1/4
    matmuls (no relayouts). M[(i, j)][src=(r,b,cc), dst=(a',b',cc)] = 1/4
    when a'==i, b'//2==j, b == 2*(b'%2)+s."""
    L = fr * fc * c
    mats = {}
    for i in (0, 1):
        for j in (0, 1):
            M = np.zeros((L, L), np.float32)
            for bp in range(fc):
                if bp // 2 != j:
                    continue
                for r in range(fr):
                    for s in range(fr):
                        b = 2 * (bp % 2) + s
                        for cc in range(c):
                            src = (r * fc + b) * c + cc
                            dst = (i * fc + bp) * c + cc
                            M[src, dst] += 0.25
            mats[(i, j)] = M
    return mats


def avg_pool_rect(x6, c: int):
    """Fused factor-2 average pool in fr=2 × fc=4 block layout — equal to
    ``space_to_depth_rect(avg_pool(depth_to_space_rect(x6)), 2, 4)`` but
    with no layout round-trip: 4 parity slices × lane matmuls.
    x6: (B, hr, wc, 8c) → (B, hr/2, wc/2, 8c)."""
    mats = _pool_lane_mats(c)
    out = None
    for i in (0, 1):
        for j in (0, 1):
            s = x6[:, i::2, j::2, :]
            t = jnp.einsum("bhwk,kl->bhwl", s,
                           jnp.asarray(mats[(i, j)], x6.dtype))
            out = t if out is None else out + t
    return out


def conv_s2d(x_s2d, w_s2d, preferred_element_type=None):
    """SAME (zero-pad) conv in s2d space — equals the dense zero-pad SAME
    conv everywhere except possibly the outer (f·halo − pad) dense ring,
    which callers overwrite with their boundary treatment anyway.

    With a bfloat16 kernel, the input is cast to bfloat16 and the MXU
    accumulates in float32 (the fast-inexact mode)."""
    out_t = preferred_element_type or jnp.float32
    if w_s2d.dtype == jnp.bfloat16:
        x_s2d = x_s2d.astype(jnp.bfloat16)
        return lax.conv_general_dilated(
            x_s2d, w_s2d, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(out_t)
    return lax.conv_general_dilated(
        x_s2d, w_s2d, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred_element_type or x_s2d.dtype)


@functools.lru_cache(maxsize=None)
def _group_matrix_np(f: int, C: int, G: int) -> np.ndarray:
    """(f²·C, G) 0/1 matrix mapping s2d channels to their GroupNorm group
    — group statistics become two thin MXU matmuls."""
    M = np.zeros((f * f * C, G), np.float32)
    for k in range(f * f * C):
        M[k, (k % C) // (C // G)] = 1.0
    return M


def group_norm_s2d(x_s2d, f: int, C: int, num_groups: int, scale, bias,
                   valid_count: Optional[float] = None,
                   mask=None, eps: float = 1e-5):
    """GroupNorm over original channels while staying in s2d layout.

    Statistics run over (h, w, f², C/G) per group — identical to dense
    GroupNorm — computed via two thin matmuls against a 0/1 group matrix
    (MXU-friendly; avoids a lane-hostile (…, C/G) reshape). With
    ``mask``/``valid_count`` (padded grids), masked entries are excluded
    from the statistics and re-zeroed afterwards.
    """
    B, h, w, _ = x_s2d.shape
    G = num_groups
    M = jnp.asarray(_group_matrix_np(f, C, G), x_s2d.dtype)
    x_stat = x_s2d
    if mask is not None:
        x_stat = x_s2d * jnp.repeat(mask, C, axis=-1)[None]
    n = (valid_count if valid_count is not None
         else float(h * w * f * f)) * (C // G)
    s1 = jnp.einsum("bhwk,kg->bg", x_stat, M)
    s2 = jnp.einsum("bhwk,kg->bg", x_stat * x_stat, M)
    mean = s1 / n
    var = s2 / n - mean * mean
    inv = lax.rsqrt(var + eps)
    mean_c = jnp.einsum("bg,kg->bk", mean, M)
    inv_c = jnp.einsum("bg,kg->bk", inv, M)
    scale_c = jnp.tile(scale, f * f)
    bias_c = jnp.tile(bias, f * f)
    y = (x_s2d - mean_c[:, None, None, :]) * inv_c[:, None, None, :]
    y = y * scale_c + bias_c
    if mask is not None:
        y = y * jnp.repeat(mask, C, axis=-1)[None]
    return y


def pad_to_multiple(x, f: int):
    """Zero-pad H and W of NHWC up to multiples of f; returns (padded,
    (H, W)) with the original size for cropping."""
    B, H, W, C = x.shape
    Hp = -(-H // f) * f
    Wp = -(-W // f) * f
    if Hp == H and Wp == W:
        return x, (H, W)
    return jnp.pad(x, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0))), (H, W)


def s2d_valid_mask(H: int, W: int, f: int, dtype=jnp.float32):
    """(h, w, f²) mask of valid (non-pad) dense positions, or None when no
    padding is needed."""
    Hp = -(-H // f) * f
    Wp = -(-W // f) * f
    if Hp == H and Wp == W:
        return None
    m = np.zeros((Hp, Wp), dtype=np.float32)
    m[:H, :W] = 1.0
    m = m.reshape(Hp // f, f, Wp // f, f).transpose(0, 2, 1, 3)
    return jnp.asarray(m.reshape(Hp // f, Wp // f, f * f), dtype)

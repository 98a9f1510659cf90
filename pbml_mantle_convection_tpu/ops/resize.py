"""Resampling ops: bicubic up/down-sampling as dense matmuls, average pooling.

TPU-native redesign: the reference uses ``nn.Upsample(mode="bicubic")``
(pytorch_networks_convae.py:1227-1229, 2008-2014). On TPU the fastest exact
equivalent is a pair of small dense interpolation matrices applied as
matmuls — they run on the MXU, are fully fused by XLA, and are bit-exact with
the separable cubic-convolution definition (Keys kernel, a = -0.75,
half-pixel coordinates, clamped borders) used by torch's bicubic with
``align_corners=False``.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Keys cubic convolution kernel with parameter ``a``."""
    x = np.abs(x)
    x2 = x * x
    x3 = x2 * x
    w = np.where(
        x <= 1.0,
        (a + 2.0) * x3 - (a + 3.0) * x2 + 1.0,
        np.where(x < 2.0, a * x3 - 5.0 * a * x2 + 8.0 * a * x - 4.0 * a, 0.0),
    )
    return w


@functools.lru_cache(maxsize=None)
def _resize_matrix_np(in_size: int, out_size: int, a: float = -0.75,
                      align_corners: bool = False) -> np.ndarray:
    """(out_size, in_size) cubic interpolation matrix, float64."""
    if in_size == out_size:
        return np.eye(in_size)
    M = np.zeros((out_size, in_size), dtype=np.float64)
    if align_corners and out_size > 1:
        scale = (in_size - 1) / (out_size - 1)
        src = np.arange(out_size) * scale
    else:
        scale = in_size / out_size
        src = (np.arange(out_size) + 0.5) * scale - 0.5
    base = np.floor(src).astype(np.int64)
    frac = src - base
    for tap in range(-1, 3):
        w = _cubic_kernel(np.asarray(tap) - frac, a=a)
        idx = np.clip(base + tap, 0, in_size - 1)
        np.add.at(M, (np.arange(out_size), idx), w)
    return M


def resize_bicubic(x, out_hw, a: float = -0.75, align_corners: bool = False):
    """Bicubic resize of ``[..., H, W]`` (or ``[..., H, W, C]`` via axes) fields.

    Operates on the last two axes of a ``[..., H, W]`` array. For NHWC
    tensors use :func:`resize_bicubic_nhwc`.
    """
    H, W = x.shape[-2], x.shape[-1]
    out_h, out_w = out_hw
    dt = x.dtype
    My = jnp.asarray(_resize_matrix_np(H, out_h, a, align_corners), dtype=dt)
    Mx = jnp.asarray(_resize_matrix_np(W, out_w, a, align_corners), dtype=dt)
    # [..., H, W] -> [..., out_h, W] -> [..., out_h, out_w]
    y = jnp.einsum("oh,...hw->...ow", My, x)
    y = jnp.einsum("pw,...ow->...op", Mx, y)
    return y


def resize_bicubic_nhwc(x, out_hw, a: float = -0.75,
                        align_corners: bool = False):
    """Bicubic resize of an NHWC tensor on the H and W axes."""
    H, W = x.shape[1], x.shape[2]
    out_h, out_w = out_hw
    dt = x.dtype
    My = jnp.asarray(_resize_matrix_np(H, out_h, a, align_corners), dtype=dt)
    Mx = jnp.asarray(_resize_matrix_np(W, out_w, a, align_corners), dtype=dt)
    y = jnp.einsum("oh,bhwc->bowc", My, x)
    y = jnp.einsum("pw,bowc->bopc", Mx, y)
    return y


@functools.lru_cache(maxsize=None)
def _lin_matrix_np(in_size: int, out_size: int,
                   align_corners: bool = False) -> np.ndarray:
    if in_size == out_size:
        return np.eye(in_size)
    M = np.zeros((out_size, in_size), dtype=np.float64)
    if align_corners and out_size > 1:
        src = np.arange(out_size) * (in_size - 1) / (out_size - 1)
    else:
        src = np.clip((np.arange(out_size) + 0.5) * in_size / out_size - 0.5,
                      0, in_size - 1)
    base = np.floor(src).astype(np.int64)
    frac = src - base
    hi = np.clip(base + 1, 0, in_size - 1)
    np.add.at(M, (np.arange(out_size), base), 1.0 - frac)
    np.add.at(M, (np.arange(out_size), hi), frac)
    return M


def resize_bilinear_nhwc(x, out_hw, align_corners: bool = False):
    """Bilinear resize (used by the reference's ``up_layer``,
    datasetio.py:94)."""
    H, W = x.shape[1], x.shape[2]
    out_h, out_w = out_hw
    dt = x.dtype
    My = jnp.asarray(_lin_matrix_np(H, out_h, align_corners), dtype=dt)
    Mx = jnp.asarray(_lin_matrix_np(W, out_w, align_corners), dtype=dt)
    y = jnp.einsum("oh,bhwc->bowc", My, x)
    y = jnp.einsum("pw,bowc->bopc", Mx, y)
    return y


def avg_pool_nhwc(x, factor: int):
    """AvgPool2d(kernel=factor, stride=factor), VALID padding.

    Matches ``nn.AvgPool2d((f, f), stride=f)``
    (pytorch_networks_convae.py:1225): trailing rows/cols that do not fill a
    full window are dropped. Implemented as a reshape-mean — free layout
    change + one fused VPU reduction, and cleanly differentiable (XLA's
    reduce_window lacks a linearization rule here).
    """
    B, H, W, C = x.shape
    h, w = H // factor, W // factor
    x = x[:, : h * factor, : w * factor, :]
    x = x.reshape(B, h, factor, w, factor, C)
    return jnp.mean(x, axis=(2, 4))

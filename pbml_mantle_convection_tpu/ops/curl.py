"""Curl (stream-function) heads: divergence-free velocity reconstruction.

Every Stokes surrogate in the framework derives (u, v) from a predicted
stream function ``a`` via u = ∂a/∂y, v = -∂a/∂x, which guarantees
∂u/∂x + ∂v/∂y = 0 in the interior to machine precision. The three variants
below reproduce the (load-bearing) crop/pad/BC differences between the
reference models:

* :func:`curl_head_padded` — NewFluidNet (pytorch_networks_convae.py:1356-1388)
  and Unet (:2038-2068): VALID central differences, crop to (H-2, W-2),
  replicate-pad back and stamp antisymmetric free-slip sidewall BCs.
* :func:`curl_head_cropped` — FluidNet (:1681-1697): ``a`` lives on an
  (H+2, W+2) extended grid, central differences crop it back to (H, W),
  no BC stamping.
* :func:`curl_head_valid` — Transolver
  (Transolver_Structured_Mesh_2D-checkpoint.py:192-204): raw VALID output.

Fields are ``[..., H, W]``.
"""

from __future__ import annotations

import jax.numpy as jnp

from .stencils import dx_center, dy_center, replicate_pad


def _zero_corners(x):
    x = x.at[..., 0, 0].set(0.0)
    x = x.at[..., 0, -1].set(0.0)
    x = x.at[..., -1, 0].set(0.0)
    x = x.at[..., -1, -1].set(0.0)
    return x


def curl_head_padded(a):
    """NewFluidNet/Unet curl head: (H, W) stream function → (H, W) u, v.

    Reference: pytorch_networks_convae.py:1369-1386 (NewFluidNet) and
    :2051-2068 (Unet).
    """
    u = dy_center(a)[..., :, 1:-1]      # (H-2, W-2)
    v = -dx_center(a)[..., 1:-1, :]     # (H-2, W-2)

    u = replicate_pad(u, (1, 1, 1, 1))  # (H, W)
    u = u.at[..., :, 0].set(-u[..., :, 1])
    u = u.at[..., :, -1].set(-u[..., :, -2])
    u = _zero_corners(u)

    v = replicate_pad(v, (1, 1, 1, 1))
    v = v.at[..., 0, :].set(-v[..., 1, :])
    v = v.at[..., -1, :].set(-v[..., -2, :])
    v = _zero_corners(v)

    return u, v


def curl_head_cropped(a):
    """FluidNet curl head: (H+2, W+2) stream function → (H, W) u, v.

    Reference: pytorch_networks_convae.py:1694-1697.
    """
    u = dy_center(a)[..., :, 1:-1]
    v = -dx_center(a)[..., 1:-1, :]
    return u, v


def curl_head_valid(a):
    """Transolver curl head: (H, W) stream function → (H-2, W-2) u, v.

    Reference: Transolver_Structured_Mesh_2D-checkpoint.py:201-204.
    """
    u = dy_center(a)[..., :, 1:-1]
    v = -dx_center(a)[..., 1:-1, :]
    return u, v


def gaussian_blur_5x9(a, sigma: float = 2.55):
    """Separable 5×9 Gaussian blur on a [..., H, W] field.

    Stand-in for the reference Unet's ``v2.GaussianBlur(kernel_size=(5, 9),
    sigma=(0.1, 5.0))`` (pytorch_networks_convae.py:1800-1801). The torch
    transform samples sigma randomly per call — even in eval — which is not
    reproducible; we use the fixed range midpoint. Replicate-padded edges.
    """
    import numpy as np

    def kern(n):
        x = np.arange(n) - (n - 1) / 2.0
        k = np.exp(-0.5 * (x / sigma) ** 2)
        return jnp.asarray(k / k.sum(), a.dtype)

    ky = kern(5)
    kx = kern(9)
    p = replicate_pad(a, (4, 4, 2, 2))
    out = jnp.zeros_like(a)
    for i in range(5):
        out = out + ky[i] * p[..., i:i + a.shape[-2], 4:4 + a.shape[-1]]
    p2 = replicate_pad(out, (4, 4, 0, 0))
    out = jnp.zeros_like(a)
    for j in range(9):
        out = out + kx[j] * p2[..., :, j:j + a.shape[-1]]
    return out


def blur3x3(a):
    """Replicate-pad + 3×3 box blur on the stream function.

    Reference: NewFluidNet ``blurr`` option
    (pytorch_networks_convae.py:1163-1172, 1359-1361).
    """
    p = replicate_pad(a, (1, 1, 1, 1))
    out = jnp.zeros_like(a)
    for dy in range(3):
        for dx in range(3):
            out = out + p[..., dy:dy + a.shape[-2], dx:dx + a.shape[-1]]
    return out / 9.0

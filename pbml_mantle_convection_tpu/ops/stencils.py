"""Finite-difference stencil operators on 2-D fields.

TPU-native redesign of the reference's conv2d-based stencil library
(reference: pytorch_networks_convae.py:183-263). Instead of 1-D convolutions
we use pure array slicing — XLA fuses these into the surrounding elementwise
code, so each stencil costs one fused VPU pass instead of a convolution
dispatch.

Conventions
-----------
Fields have shape ``[..., H, W]`` where ``H`` is the vertical (y) axis with
row 0 at the hot bottom, and ``W`` the horizontal (x) axis. All operators
reproduce the exact output shapes of the reference's VALID convolutions:
a 3-tap stencil along an axis shrinks that axis by 2.
"""

from __future__ import annotations

import jax.numpy as jnp


# ---------------------------------------------------------------------------
# One-sided and central first differences.
# The reference implements these as VALID conv2d with 3-tap kernels
# (pytorch_networks_convae.py:183-232). A VALID 3-tap conv along x evaluated
# at output index i corresponds to the difference centred at input index i+1,
# hence the slice patterns below.
# ---------------------------------------------------------------------------


def dx_left(x):
    """Backward difference along x: out[i] = x[i+1] - x[i], width W-2.

    Reference kernel [-1, 1, 0] (pytorch_networks_convae.py:201-207).
    """
    return x[..., 1:-1] - x[..., :-2]


def dx_right(x):
    """Forward difference along x: out[i] = x[i+2] - x[i+1], width W-2.

    Reference kernel [0, -1, 1] (pytorch_networks_convae.py:183-189).
    """
    return x[..., 2:] - x[..., 1:-1]


def dx_center(x):
    """Central difference along x: out[i] = (x[i+2] - x[i]) / 2, width W-2.

    Reference kernel [-0.5, 0, 0.5] (pytorch_networks_convae.py:217-223).
    """
    return 0.5 * (x[..., 2:] - x[..., :-2])


def dy_top(x):
    """Backward difference along y, height H-2.

    Reference kernel [-1, 1, 0]^T (pytorch_networks_convae.py:210-214).
    """
    return x[..., 1:-1, :] - x[..., :-2, :]


def dy_bot(x):
    """Forward difference along y, height H-2.

    Reference kernel [0, -1, 1]^T (pytorch_networks_convae.py:192-198).
    """
    return x[..., 2:, :] - x[..., 1:-1, :]


def dy_center(x):
    """Central difference along y, height H-2.

    Reference kernel [-0.5, 0, 0.5]^T (pytorch_networks_convae.py:226-232).
    """
    return 0.5 * (x[..., 2:, :] - x[..., :-2, :])


def du_dy(x):
    """4-tap cross kernel [1, -1, -1, 1]^T along y, height H-3.

    Reference: pytorch_networks_convae.py:235-241.
    """
    return x[..., :-3, :] - x[..., 1:-2, :] - x[..., 2:-1, :] + x[..., 3:, :]


def dv_dx(x):
    """4-tap cross kernel [1, -1, -1, 1] along x, width W-3.

    Reference: pytorch_networks_convae.py:244-250.
    """
    return x[..., :-3] - x[..., 1:-2] - x[..., 2:-1] + x[..., 3:]


def laplace(x):
    """5-point Laplacian, VALID: shape (H-2, W-2).

    Reference kernel [[0,1,0],[1,-4,1],[0,1,0]]
    (pytorch_networks_convae.py:254-260).
    """
    return (
        x[..., :-2, 1:-1]
        + x[..., 2:, 1:-1]
        + x[..., 1:-1, :-2]
        + x[..., 1:-1, 2:]
        - 4.0 * x[..., 1:-1, 1:-1]
    )


# ---------------------------------------------------------------------------
# Divergence ("mass") operator.
# ---------------------------------------------------------------------------


def get_mass(u, v, bc: bool = False):
    """Velocity divergence du/dx + dv/dy on the interior, shape (H-2, W-2).

    Reference: pytorch_networks_convae.py:27-52. ``du_dx`` is the central x
    difference cropped by one row top/bottom; ``dv_dy`` the central y
    difference cropped by one column left/right. With ``bc=True`` the first
    and last columns of du_dx and rows of dv_dy are scaled by 2/1.5,
    mimicking the one-sided boundary metric of the reference.
    """
    du_dx = dx_center(u)[..., 1:-1, :]
    dv_dy = dy_center(v)[..., :, 1:-1]

    if bc:
        edge_x = jnp.ones(du_dx.shape[-1], dtype=u.dtype).at[0].set(2.0 / 1.5)
        edge_x = edge_x.at[-1].set(2.0 / 1.5)
        du_dx = du_dx * edge_x
        edge_y = jnp.ones(dv_dy.shape[-2], dtype=v.dtype).at[0].set(2.0 / 1.5)
        edge_y = edge_y.at[-1].set(2.0 / 1.5)
        dv_dy = dv_dy * edge_y[..., :, None]

    return du_dx + dv_dy


# ---------------------------------------------------------------------------
# Physics-aware padding.
# ---------------------------------------------------------------------------


def pad_grad(x, p=(1, 1, 1, 1)):
    """Linear-extrapolation pad: (left, right, top(+y end), bottom(row 0)).

    Each padded row/column extends the local gradient,
    e.g. left pad = 2*x[:,0] - x[:,1]. Reference:
    pytorch_networks_convae.py:55-83 (note its p[2] pads the *last* row and
    p[3] the *first* row; this is preserved).
    """
    for _ in range(p[0]):
        xb = 2.0 * x[..., :, 0:1] - x[..., :, 1:2]
        x = jnp.concatenate((xb, x), axis=-1)
    for _ in range(p[1]):
        xb = 2.0 * x[..., :, -1:] - x[..., :, -2:-1]
        x = jnp.concatenate((x, xb), axis=-1)
    for _ in range(p[2]):
        xb = 2.0 * x[..., -1:, :] - x[..., -2:-1, :]
        x = jnp.concatenate((x, xb), axis=-2)
    for _ in range(p[3]):
        xb = 2.0 * x[..., 0:1, :] - x[..., 1:2, :]
        x = jnp.concatenate((xb, x), axis=-2)
    return x


def replicate_pad(x, pad=(1, 1, 1, 1)):
    """Replicate (edge) padding (left, right, top-row-0 side, bottom).

    ``pad`` is (left, right, low-y, high-y) amounts on the last two axes.
    """
    l, r, b, t = pad
    cfg = [(0, 0)] * (x.ndim - 2) + [(b, t), (l, r)]
    return jnp.pad(x, cfg, mode="edge")


def pad_uvp(u, v, p=None):
    """Boundary-condition padding for interior (H-2, W-2) velocity fields.

    Reference: pytorch_networks_convae.py:145-178. u is replicate-padded in y
    and antisymmetrically mirrored in x (free-slip sidewalls), v the
    transpose; corners are zeroed. p (if given) is replicate padded with
    zeroed corners.
    """

    def zero_corners(a):
        a = a.at[..., 0, 0].set(0.0)
        a = a.at[..., 0, -1].set(0.0)
        a = a.at[..., -1, 0].set(0.0)
        a = a.at[..., -1, -1].set(0.0)
        return a

    u = replicate_pad(u, (0, 0, 1, 1))
    u = jnp.concatenate((-u[..., :, 0:1], u, -u[..., :, -1:]), axis=-1)
    u = zero_corners(u)

    v = replicate_pad(v, (1, 1, 0, 0))
    v = jnp.concatenate((-v[..., 0:1, :], v, -v[..., -1:, :]), axis=-2)
    v = zero_corners(v)

    if p is not None:
        p = replicate_pad(p, (1, 1, 1, 1))
        p = zero_corners(p)

    return u, v, p


def stamp_temperature_bc(T, bottom: float = 1.0, top: float = 0.0,
                         core_cool: bool = False):
    """Dirichlet top/bottom + Neumann (copy) sidewalls on a [..., H, W] field.

    Reference: pytorch_networks_convae.py:465-471 and
    advect_wi_gaia.py:624-629. With ``core_cool`` the bottom row is left
    untouched (it evolves, advect_wi_gaia.py:624-625).
    """
    if not core_cool:
        T = T.at[..., 0, :].set(bottom)
    T = T.at[..., -1, :].set(top)
    T = T.at[..., :, 0].set(T[..., :, 1])
    T = T.at[..., :, -1].set(T[..., :, -2])
    return T

"""Structured 2-D mantle-convection grid: coordinates, metrics, BC masks.

The reference grid is produced by GAIA (126 interior layers, aspect ratio 4
→ 128×506 including boundary rows/cols; prepare_gaia_ini.py:23-26) and read
back via ``state["pos"]`` (advect_wi_gaia.py:560-575). Coordinates are
clamped so x ∈ [0, AR], y ∈ [0, 1] with exact boundary values stamped
(datasetio.py:149-152, 401-404). This module generates the same grid
natively, parameterized so any (layers, aspect-ratio) resolution works —
e.g. the 256×256 benchmark grid.
"""

from __future__ import annotations

import dataclasses
from functools import cached_property

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Grid:
    """Cell-centred box grid with stamped boundary rows/columns.

    ``H`` rows span y ∈ [0, 1] (row 0 = hot bottom), ``W`` columns span
    x ∈ [0, aspect]. Rows/cols 1..-2 are interior cell centres of an
    (H-2) × (W-2) discretization; rows/cols 0 and -1 sit exactly on the
    boundary (the reference's clamping, datasetio.py:149-152).
    """

    H: int = 128
    W: int = 506
    aspect: float = 4.0
    dtype: str = "float64"

    @property
    def _jdtype(self) -> str:
        """The requested dtype, degraded gracefully to float32 when JAX
        x64 is disabled (avoids per-array truncation warnings, e.g. in
        the driver's non-x64 multichip dryrun)."""
        if self.dtype == "float64" and not jax.config.jax_enable_x64:
            return "float32"
        return self.dtype

    @property
    def n_layers(self) -> int:
        return self.H - 2

    @property
    def dy(self) -> float:
        """Interior grid spacing 1/(H-2); dx == dy by construction
        (advect_wi_gaia.py:739 uses dx = 1/126 on the 128-row grid)."""
        return 1.0 / (self.H - 2)

    def _centers(self, n: int, length: float) -> np.ndarray:
        h = length / (n - 2)
        c = (np.arange(n, dtype=np.float64) - 0.5) * h
        c[0] = 0.0
        c[-1] = length
        return c

    @cached_property
    def xc_np(self) -> np.ndarray:
        """(H, W) x-coordinates as host NumPy f64 — for host-side code
        (data generation, memmap stores). Pulling ``xc`` back with
        ``np.asarray`` costs a device round-trip (~100 s through the
        remote-compile tunnel for the tiny convert); this never touches
        the device."""
        x = self._centers(self.W, self.aspect)
        return np.ascontiguousarray(
            np.broadcast_to(x[None, :], (self.H, self.W)))

    @cached_property
    def yc_np(self) -> np.ndarray:
        """(H, W) y-coordinates as host NumPy f64 (see ``xc_np``)."""
        y = self._centers(self.H, 1.0)
        return np.ascontiguousarray(
            np.broadcast_to(y[:, None], (self.H, self.W)))

    @cached_property
    def xc(self) -> jnp.ndarray:
        """(H, W) x-coordinate of cell centres."""
        return jnp.asarray(self.xc_np, dtype=self._jdtype)

    @cached_property
    def yc(self) -> jnp.ndarray:
        """(H, W) y-coordinate of cell centres (0 = bottom)."""
        return jnp.asarray(self.yc_np, dtype=self._jdtype)

    @cached_property
    def sdf(self) -> jnp.ndarray:
        """Boundary indicator: 1 on the outermost ring, 0 inside
        (advect_wi_gaia.py:566-570)."""
        m = np.zeros((self.H, self.W))
        m[0, :] = m[-1, :] = m[:, 0] = m[:, -1] = 1.0
        return jnp.asarray(m, dtype=self._jdtype)

    @cached_property
    def sdf2(self) -> jnp.ndarray:
        """Interior indicator: 0 on the ring, 1 inside
        (advect_wi_gaia.py:571-575)."""
        m = np.ones((self.H, self.W))
        m[0, :] = m[-1, :] = m[:, 0] = m[:, -1] = 0.0
        return jnp.asarray(m, dtype=self._jdtype)

    @cached_property
    def pos(self) -> jnp.ndarray:
        """(H*W, 2) flattened (x, y) positions, matching GAIA's
        ``state["pos"]`` layout (advect_wi_gaia.py:560-564)."""
        return jnp.stack(
            [self.xc.reshape(-1), self.yc.reshape(-1)], axis=1)


DEFAULT_GRID = Grid()

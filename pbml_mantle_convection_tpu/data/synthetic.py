"""Synthetic snapshot stores for tests, demos and benchmarks.

The reference's data lives on a cluster filesystem we don't ship; this
module fabricates physically-plausible snapshot stores with the same
structure (convection-cell velocity from a stream function, boundary-layer
temperature profiles, FK-consistent viscosity) so every pipeline stage can
be exercised hermetically. The debug-mode ``*_select_init`` tensors of the
reference (datasetio.py:159-172) play the same role.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from ..constants import SimParams, velocity_scaler
from ..sim.grid import Grid
from .dataset import SnapshotStore


def synthetic_store(
    grid: Optional[Grid] = None,
    params_list: Sequence[SimParams] = (SimParams(3.0, 1e8, 10.0),),
    n_snapshots: int = 16,
    with_p: bool = False,
    seed: int = 0,
) -> SnapshotStore:
    """Build a synthetic :class:`SnapshotStore` of evolving convection
    cells for each parameter triple."""
    grid = grid or Grid(H=32, W=68)
    rng = np.random.default_rng(seed)
    xc = np.asarray(grid.xc, np.float64)
    yc = np.asarray(grid.yc, np.float64)
    H, W = xc.shape

    Ts, us, vs, ps = [], [], [], []
    paras, steps, sims, times = [], [], [], []
    for sim_i, sp in enumerate(params_list):
        scale = velocity_scaler(sp.raq, sp.fkt, sp.fkp)
        phase = rng.uniform(0, 2 * np.pi)
        k = rng.integers(1, 4)
        t = 0.0
        for i in range(n_snapshots):
            t += 1e-4 * (1.0 + 0.1 * rng.random())
            amp = 1.0 - np.exp(-5.0 * t / 1e-3)
            a = np.sin(np.pi * yc) * np.sin(
                k * np.pi * xc / grid.aspect + phase + 0.5 * t / 1e-4)
            u = np.pi * np.cos(np.pi * yc) * np.sin(
                k * np.pi * xc / grid.aspect + phase) * amp * scale
            v = -(k * np.pi / grid.aspect) * np.sin(np.pi * yc) * np.cos(
                k * np.pi * xc / grid.aspect + phase) * amp * scale
            T = np.clip(
                1.0 - yc + 0.1 * amp * a
                + 0.01 * rng.standard_normal((H, W)), 0.0, 1.0)
            T[0, :] = 1.0
            T[-1, :] = 0.0
            Ts.append(T)
            us.append(u)
            vs.append(v)
            if with_p:
                ps.append(np.cos(np.pi * yc) * amp)
            paras.append([sp.raq, sp.fkt, sp.fkp])
            steps.append(i + 1)
            sims.append(sim_i)
            times.append(t)

    return SnapshotStore(
        T=np.asarray(Ts), u=np.asarray(us), v=np.asarray(vs),
        p=np.asarray(ps) if with_p else None,
        paras=np.asarray(paras), step_index=np.asarray(steps),
        sim_id=np.asarray(sims), times=np.asarray(times),
        xc=xc, yc=yc)

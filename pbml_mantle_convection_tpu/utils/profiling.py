"""Profiling/observability helpers.

Upgrades the reference's ad-hoc ``time.time()`` deltas
(multigpu.py:352-380, advect_wi_gaia.py:585-652) with a step timer that
keeps per-step wall times (the reference's ``TS_vec``) plus an optional
``jax.profiler`` trace context.
"""

from __future__ import annotations

import contextlib
import time
from typing import List, Optional

import jax


class StepTimer:
    """Collects per-step wall times; drop-in for the reference's TS_vec
    pickles."""

    def __init__(self):
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)
        self._t0 = None
        return False

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)

    @property
    def steps_per_s(self) -> float:
        return 1.0 / self.mean if self.times else 0.0


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """jax.profiler trace context (no-op when log_dir is None)."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

"""Depth-k thread prefetcher for host-resident input pipelines.

The host-resident dataset mode (data/dataset.py) gathers each batch's
rows from a NumPy/memmap store and ships them with ``jax.device_put``;
both are host work the accelerator would otherwise wait on. Wrapping the
per-batch constructor in :func:`prefetch_iter` runs it on a single
worker thread up to ``depth`` batches ahead, so in steady state the
gather + H2D of batch k+1 overlaps the device compute of batch k (the
reference's host-side ``__getitem__`` + DataLoader workers play this
role, datasetio.py:595-654 / multigpu.py:772-779).

One worker thread is deliberate: batch construction ends in a jitted
call whose dispatch is async, so a single thread keeps the device queue
ordered and deterministic while still hiding the host latency.
"""

from __future__ import annotations

from collections import deque
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, TypeVar

T = TypeVar("T")


def prefetch_iter(make: Callable[[int], T], n: int,
                  depth: int = 2) -> Iterator[T]:
    """Yield ``make(0), …, make(n-1)`` with up to ``depth`` results
    computed ahead on a worker thread.

    ``make`` runs on the worker only — it must not mutate state the
    consumer reads concurrently (the dataset precomputes per-epoch
    permutations and RNG keys up front for exactly this reason).
    ``depth <= 0`` degrades to a plain synchronous loop.
    """
    if n <= 0:
        return
    if depth <= 0:
        for i in range(n):
            yield make(i)
        return
    with ThreadPoolExecutor(max_workers=1) as ex:
        futs = deque(ex.submit(make, i) for i in range(min(depth, n)))
        nxt = len(futs)
        while futs:
            out = futs.popleft().result()
            if nxt < n:
                futs.append(ex.submit(make, nxt))
                nxt += 1
            yield out

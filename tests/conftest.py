"""Test configuration: run JAX on CPU with 8 virtual devices and x64.

Multi-device tests exercise the DP mesh without TPU hardware
(SURVEY.md §4: xla_force_host_platform_device_count), and float64 lets us
verify bit-level parity with the float64 reference semantics.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

# Under pytest-xdist (the default run, pyproject addopts -n auto) each
# worker process would otherwise spin up XLA's full intra-op thread
# pool — 8 workers × 8 threads thrash an 8-core box and parallelism
# buys nothing (measured: 678 s vs 701 s serial). One compute thread
# per worker restores near-linear scaling; serial/debug runs (-n0)
# keep the full pool.
if os.environ.get("PYTEST_XDIST_WORKER"):
    os.environ.setdefault("XLA_CPU_MULTI_THREAD_EIGEN", "false")
    os.environ["XLA_FLAGS"] += " --xla_cpu_multi_thread_eigen=false"
    os.environ.setdefault("OMP_NUM_THREADS", "1")

import jax  # noqa: E402

# The env var alone is not enough when a site customization registers an
# accelerator plugin (e.g. the axon TPU relay) — force the platform too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

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

import jax  # noqa: E402

# The env var alone is not enough when a site customization registers an
# accelerator plugin (e.g. the axon TPU relay) — force the platform too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

"""Test configuration: run everything on a virtual 8-device CPU mesh so
sharding paths are exercised without TPU hardware (the driver separately
dry-runs the multi-chip path; bench.py runs on the real chip).

Note: this machine's sitecustomize force-registers the remote 'axon' TPU
backend and overrides JAX_PLATFORMS, so we must set the platform via
jax.config AFTER importing jax — env vars alone are ignored.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

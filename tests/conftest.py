"""Test config: run everything on CPU with 8 virtual devices.

The axon TPU plugin ignores JAX_PLATFORMS, so we force the CPU backend via
jax.config before any backend initialization. Multi-chip sharding logic is
validated on a virtual 8-device CPU mesh, mirroring how the driver dry-runs
the multi-chip path; real-TPU perf is measured separately by bench.py.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORM_NAME"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)

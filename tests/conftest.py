"""Test configuration: run everything on a virtual 8-device CPU mesh.

The container pre-imports jax at interpreter startup (sitecustomize registers
the axon TPU backend), so setting JAX_PLATFORMS in os.environ here is too
late — we must switch platforms through jax.config before any backend
initializes. XLA_FLAGS is still read lazily at first backend init, so the
host-device-count flag works from here.

Multi-chip sharding tests use the 8 virtual CPU devices; the driver
separately dry-runs the multichip path via __graft_entry__.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)

"""Test config: force an 8-device virtual CPU platform.

The CI/dev image preloads jax with ``JAX_PLATFORMS=axon`` (a tunneled
TPU), so env vars set here are too late — the config must be updated
through jax.config.  Sharding/partitioning tests need a fake
multi-chip mesh; the XLA host-device-count flag is read at first
backend use, which hasn't happened yet at conftest import time.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)

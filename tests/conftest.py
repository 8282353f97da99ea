"""Test config: force an 8-device virtual CPU platform.

The CI/dev image preloads jax with ``JAX_PLATFORMS=axon`` (a tunneled
TPU), so env vars set here are too late — the config must be updated
through jax.config.  Sharding/partitioning tests need a fake
multi-chip mesh; the XLA host-device-count flag is read at first
backend use, which hasn't happened yet at conftest import time.

A persistent XLA compilation cache under ``.jax_test_cache/`` makes
warm suite runs compile-free (the suite is compile-dominated on this
2-core image: measured ~16 min cold vs well under the 10-minute CI
budget warm).  Cache keys hash the optimized HLO, so source changes
invalidate exactly the executables they affect.
"""

import os
from pathlib import Path

# Silence the per-load "machine feature +prefer-no-scatter" XLA AOT
# notices (compiler-preference pseudo-features recorded by the cache
# writer; compile and execution happen on the same host here).
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).parent.parent / ".jax_test_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)

"""Subprocess wrapper: run the training CLI on the CPU backend.

Run as ``python tests/_cli_preempt_worker.py <cli args...>``.  The axon
TPU plugin ignores ``JAX_PLATFORMS`` env, so a plain CLI subprocess
would grab the real chip; force CPU through jax.config before any
backend use (same trick as tests/conftest.py) and keep it to one
virtual device so compile time stays small.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
         if "host_platform_device_count" not in f]
os.environ["XLA_FLAGS"] = " ".join(flags)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Share the suite's persistent compilation cache: the three CLI runs
# of the kill-and-resume test compile identical programs.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_test_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from dream_gnn_tpu.train import cli  # noqa: E402

if __name__ == "__main__":
    cli.main(sys.argv[1:])

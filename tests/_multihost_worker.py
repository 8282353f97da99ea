"""Subprocess worker for the 2-process jax.distributed CPU test.

Run as ``python tests/_multihost_worker.py <coordinator> <nproc> <pid>``.
Each process brings up 2 virtual CPU devices, joins the distributed
coordination service through ``multihost.initialize``, builds the
global mesh, places its local shard of a global array with
``jax.make_array_from_process_local_data``, and reduces it with a psum
over the mesh — the multi-host execution model of SURVEY.md §2.C row 5
(the reference has no distributed support; this is the new-framework
mandate).  Prints one machine-checkable line on success.
"""

import os
import sys

# Running as a script puts tests/ on sys.path, not the repo root.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    coordinator, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    # Exactly 2 virtual CPU devices per process; must be set before
    # backend init, replacing any count inherited from the parent
    # (pytest's conftest exports an 8-device flag).
    flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
             if "host_platform_device_count" not in f]
    flags.append("--xla_force_host_platform_device_count=2")
    os.environ["XLA_FLAGS"] = " ".join(flags)

    import jax

    # The axon TPU plugin ignores JAX_PLATFORMS env; force CPU through
    # the config before any backend use (same trick as tests/conftest).
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_test_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from dream_gnn_tpu.sharding import multihost

    multihost.initialize(coordinator_address=coordinator,
                         num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.process_index() == pid, jax.process_index()

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = multihost.global_mesh(mp=1)
    n_global = len(jax.devices())
    assert n_global == 2 * nproc, n_global

    # Each process owns a contiguous slice of the global leading axis.
    global_len = 8
    sl = multihost.local_shard_slice(global_len)
    assert sl == slice(pid * 4, pid * 4 + 4), sl
    local = np.arange(global_len, dtype=np.float32)[sl].reshape(-1, 1)
    sharding = NamedSharding(mesh, P("dp", None))
    garr = jax.make_array_from_process_local_data(
        sharding, local, (global_len, 1))

    # Cross-process collective: global sum via jnp.sum on the sharded
    # array (XLA inserts the psum over the process-spanning dp axis).
    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(garr)
    expected = float(np.arange(global_len).sum())
    got = float(total)
    assert got == expected, (got, expected)
    print(f"MULTIHOST_OK pid={pid} nproc={jax.process_count()} "
          f"devices={n_global} sum={got}", flush=True)


if __name__ == "__main__":
    main()

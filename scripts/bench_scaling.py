"""Edges/s scaling-efficiency harness (BASELINE north star: >=80%
efficiency from 1 chip to a multi-host slice).

Measures the edge-partitioned SpMM (sharding/edge_partition.py) across
1..N_devices shards of the synthetic scale bipartite graph and reports
throughput + efficiency vs the single-shard baseline.  On this image
only one real chip is reachable, so multi-chip rows appear when run on
a pod slice; ``--cpu-mesh`` exercises the code path on 8 virtual
devices (compile/correctness only — virtual-device timings are not
perf numbers).
"""

import _bootstrap  # noqa: F401  (repo root on sys.path)

_bootstrap.setup_jax_cache()

import sys
import time

import numpy as np


def main():
    if "--cpu-mesh" in sys.argv:
        import os

        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8").strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from dream_gnn_tpu.graph.coo import coo_from_arrays
    from dream_gnn_tpu.sharding.edge_partition import (put_sharded_coo,
                                                       shard_coo_by_dst,
                                                       spmm_sharded)
    from dream_gnn_tpu.sharding.mesh import make_mesh

    small = "--small" in sys.argv
    n = 4096 if small else 100_000
    e = 200_000 if small else 10_000_000
    d = 128
    rng = np.random.default_rng(0)
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    val = (rng.random(e) + 0.5).astype(np.float32)
    g = coo_from_arrays(src, dst, val, n, n)
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))

    n_dev = len(jax.devices())
    shard_counts = sorted({s for s in (1, 2, 4, 8, n_dev) if s <= n_dev})
    base = None
    print(f"devices={n_dev}  graph={n}x{n}, {e} edges")
    for s in shard_counts:
        mesh = make_mesh(dp=s, mp=1)
        sg = put_sharded_coo(mesh, "dp", shard_coo_by_dst(g, s))

        run = jax.jit(lambda x: jax.lax.scan(
            lambda c, _: (c * 1.000001,
                          jnp.sum(spmm_sharded(mesh, "dp", sg, c,
                                               x_sharded=False))),
            x, length=10))
        _, outs = run(x)
        jax.block_until_ready(outs)
        t0 = time.perf_counter()
        _, outs = run(x)
        jax.block_until_ready(outs)
        ms = (time.perf_counter() - t0) / 10 * 1e3
        eps = e / ms * 1e3
        if base is None:
            base = eps
        eff = eps / (base * s) * 100.0
        print(f"shards={s:2d}  {ms:8.2f} ms  {eps:.3e} edges/s  "
              f"efficiency={eff:5.1f}%")


if __name__ == "__main__":
    main()

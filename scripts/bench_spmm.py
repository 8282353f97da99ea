"""Blocked Pallas SpMM vs XLA segment-sum on the TPU (scale config)."""

import _bootstrap  # noqa: F401  (repo root on sys.path)

_bootstrap.setup_jax_cache()

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from dream_gnn_tpu.graph.blocked import blocked_pair_from_arrays
from dream_gnn_tpu.graph.coo import coo_from_arrays
from dream_gnn_tpu.kernels.pallas_spmm import spmm_blocked
from dream_gnn_tpu.kernels.spmm import spmm_coo

small = "--small" in sys.argv
n_src = n_dst = 4096 if small else 100_000
n_edges = 200_000 if small else 10_000_000
d = 128

rng = np.random.default_rng(0)
src = rng.integers(0, n_src, n_edges)
dst = rng.integers(0, n_dst, n_edges)
val = rng.random(n_edges).astype(np.float32) + 0.5
print("building blocked layout (host-side)...", flush=True)
t0 = time.perf_counter()
pair = blocked_pair_from_arrays(src, dst, val, n_src, n_dst)
print(f"layout build: {time.perf_counter() - t0:.1f}s, "
      f"chunks={pair.fwd.n_chunks}", flush=True)
g = coo_from_arrays(src, dst, val, n_src, n_dst)

x = jnp.asarray(rng.normal(size=(n_src, d)).astype(np.float32))


def timed(name, fn, graph_arg, steps=10):
    """Time scan(steps) of fn(x, graph).  The graph is a jit ARGUMENT:
    closing over ~1 GB of edge arrays bakes them into the compile
    payload and stalls the remote compiler."""
    run = jax.jit(lambda x, gr: jax.lax.scan(
        lambda c, _: (c * 1.000001, jnp.sum(fn(c, gr))), x, length=steps))
    c, outs = run(x, graph_arg)
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    c, outs = run(x, graph_arg)
    jax.block_until_ready(outs)
    ms = (time.perf_counter() - t0) / steps * 1e3
    print(f"{name:34s} {ms:9.2f} ms  ({n_edges / ms * 1e3:.3e} edges/s)",
          flush=True)


# correctness on device (jitted: eager 10M-edge dispatch through the
# relay takes minutes)
@jax.jit
def _check(x, g, pair):
    o1 = spmm_coo(g, x)
    o2 = spmm_blocked(pair, x, jnp.float32)
    return jnp.max(jnp.abs(o1 - o2)) / (1e-6 + jnp.max(jnp.abs(o1)))

print(f"rel err blocked vs segment_sum: {float(_check(x, g, pair)):.2e}",
      flush=True)

timed("segment_sum fwd", lambda x, gr: spmm_coo(gr, x), g)
timed("blocked pallas fwd (bf16)", lambda x, gr: spmm_blocked(gr, x), pair)
timed("blocked pallas fwd (fp32)",
      lambda x, gr: spmm_blocked(gr, x, jnp.float32), pair)
timed("segment_sum fwd+bwd",
      lambda x, gr: jax.grad(lambda y: jnp.sum(spmm_coo(gr, y) ** 2))(x), g)
timed("blocked pallas fwd+bwd",
      lambda x, gr: jax.grad(
          lambda y: jnp.sum(spmm_blocked(gr, y) ** 2))(x), pair)

# Grouped sub-vreg gather kernel
from dream_gnn_tpu.graph.grouped import grouped_pair_from_arrays
from dream_gnn_tpu.kernels.pallas_spmm_gather import spmm_gather

print("building grouped layout...", flush=True)
t0 = time.perf_counter()
gpair = grouped_pair_from_arrays(src, dst, val, n_src, n_dst)
print(f"grouped build: {time.perf_counter() - t0:.1f}s, "
      f"chunks={gpair.fwd.n_chunks}", flush=True)

@jax.jit
def _check2(x, g, gpair):
    o1 = spmm_coo(g, x)
    o2 = spmm_gather(gpair, x, jnp.float32)
    return jnp.max(jnp.abs(o1 - o2)) / (1e-6 + jnp.max(jnp.abs(o1)))

print(f"rel err gather vs segment_sum: "
      f"{float(_check2(x, g, gpair)):.2e}", flush=True)
timed("gather pallas fwd (bf16)", lambda x, gr: spmm_gather(gr, x), gpair)
timed("gather pallas fwd+bwd",
      lambda x, gr: jax.grad(
          lambda y: jnp.sum(spmm_gather(gr, y) ** 2))(x), gpair)

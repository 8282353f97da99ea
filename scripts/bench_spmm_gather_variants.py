"""A/B the grouped-gather SpMM kernel variants on the TPU.

Sweeps group_batch (groups fused per scatter matmul) x packed
(two-bf16-per-lane panels, half the DMA bytes) on the 10M-edge scale
config.  Run after kernel changes to pick the production defaults in
kernels/pallas_spmm_gather.py (GROUP_BATCH / PACK_PANELS).
"""

import _bootstrap  # noqa: F401  (repo root on sys.path)

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from dream_gnn_tpu.graph.grouped import grouped_pair_from_arrays
import dream_gnn_tpu.kernels.pallas_spmm_gather as psg

small = "--small" in sys.argv
n_src = n_dst = 4096 if small else 100_000
n_edges = 200_000 if small else 10_000_000
d = 128

rng = np.random.default_rng(0)
src = rng.integers(0, n_src, n_edges)
dst = rng.integers(0, n_dst, n_edges)
val = rng.random(n_edges).astype(np.float32) + 0.5

print("building grouped layout...", flush=True)
t0 = time.perf_counter()
pair = grouped_pair_from_arrays(src, dst, val, n_src, n_dst)
occ = n_edges / (pair.fwd.src_local.size)
print(f"build {time.perf_counter() - t0:.1f}s, chunks={pair.fwd.n_chunks}, "
      f"slot occupancy {occ:.2f}", flush=True)

x = jnp.asarray(rng.normal(size=(n_src, d)).astype(np.float32))


def timed(name, fn, steps=10):
    run = jax.jit(lambda x, gr: jax.lax.scan(
        lambda c, _: (c * 1.000001, jnp.sum(fn(c, gr))), x, length=steps))
    c, outs = run(x, pair)
    jax.block_until_ready(outs)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        c, outs = run(x, pair)
        jax.block_until_ready(outs)
        best = min(best, time.perf_counter() - t0)
    ms = best / steps * 1e3
    print(f"{name:38s} {ms:9.2f} ms  ({n_edges / ms * 1e3:.3e} edges/s)",
          flush=True)
    return ms


ref = None
for gb in (1, 2, 4, 8, 16):
    for packed in (False, True):
        def fwd(x, gr, gb=gb, packed=packed):
            return psg._spmm_gather_raw(gr.fwd, x, group_batch=gb,
                                        packed=packed)
        out = jax.jit(fwd)(x, pair)
        if ref is None:
            ref = out
        else:
            rel = float(jnp.max(jnp.abs(out - ref)) /
                        (1e-6 + jnp.max(jnp.abs(ref))))
            assert rel < 2e-2, (gb, packed, rel)
        timed(f"fwd gb={gb:2d} packed={int(packed)}", fwd)

# fwd+bwd at the winning defaults
timed("fwd+bwd (module defaults)",
      lambda x, gr: jax.grad(
          lambda y: jnp.sum(psg.spmm_gather(gr, y) ** 2))(x))

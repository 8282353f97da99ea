"""Phase attribution of the slab-streamed SpMM (v3) on the chip.

Ablation modes compile genuinely different programs isolating the
kernel's phases at the best measured geometry (tile=256, span=128,
w=5, cs=8, k=16; fwd 15.6 ms):

    gather_only : panel DMA + window gathers + per-chunk scalar
    no_matmul   : gather_only + one-hot mask build
    no_accum    : full matmul, but static-index accumulate
    full        : production

plus geometry probes around the optimum (window, tile).  Drives the
"where do the remaining ~110 ns/slot go" question the way round 4's
probe_spmm_overlap settled the grouped kernel.
"""

import _bootstrap  # noqa: F401

_bootstrap.setup_jax_cache()

import faulthandler
import signal

faulthandler.dump_traceback_later(900, repeat=True)
signal.alarm(3300)

import time

import jax
import jax.numpy as jnp
import numpy as np

from dream_gnn_tpu.graph.slabbed import slabbed_from_arrays
from dream_gnn_tpu.utils.timing import chained_ms
import dream_gnn_tpu.kernels.pallas_spmm_slab as pss

n_src = n_dst = 100_000
n_edges = 10_000_000
d = 128

rng = np.random.default_rng(0)
src = rng.integers(0, n_src, n_edges)
dst = rng.integers(0, n_dst, n_edges)
val = rng.random(n_edges).astype(np.float32) + 0.5
x = jnp.asarray(rng.normal(size=(n_src, d)).astype(np.float32))

print("building best-geometry layout...", flush=True)
t0 = time.perf_counter()
g = slabbed_from_arrays(src, dst, val, n_src, n_dst, tile=256,
                        span=128, window=5, cs=8, k=16)
print(f"  build {time.perf_counter() - t0:.1f}s occ={g.occupancy:.3f} "
      f"slots={g.val.size // 128}", flush=True)

slots = g.val.size // 128
for mode in (None, "gather_only", "no_matmul", "no_accum"):
    def fwd(x, gr, mode=mode):
        return pss._spmm_slab_raw(gr, x, _ablate=mode)
    ms = chained_ms(fwd, x, args=(g,), n=8, reps=3, floor_ms=None,
                    name=str(mode))
    print(f"{str(mode):12s} {ms:8.2f} ms  ({ms * 1e6 / slots:.0f} "
          f"ns/slot)", flush=True)

print("\ngeometry probes:", flush=True)
for (tile, window, cs, k) in ((256, 4, 8, 16), (384, 4, 8, 16),
                              (256, 5, 8, 32), (256, 5, 4, 16)):
    try:
        gg = slabbed_from_arrays(src, dst, val, n_src, n_dst,
                                 tile=tile, span=128, window=window,
                                 cs=cs, k=k)
    except ValueError as e:
        print(f"t={tile} w={window} cs={cs} k={k}: rejected {e}",
              flush=True)
        continue

    def fwd(x, gr):
        return pss._spmm_slab_raw(gr, x)
    try:
        ms = chained_ms(fwd, x, args=(gg,), n=8, reps=3,
                        floor_ms=None, name=f"t{tile}w{window}")
    except Exception as e:
        print(f"t={tile} w={window} cs={cs} k={k}: FAILED "
              f"{str(e)[:150]}", flush=True)
        continue
    print(f"t={tile} w={window} cs={cs} k={k}: {ms:8.2f} ms "
          f"occ={gg.occupancy:.2f}", flush=True)

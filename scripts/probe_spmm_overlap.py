"""MXU/VPU overlap probe for the grouped-gather SpMM (VERDICT r3 #3).

docs/kernels.md §4 decomposes the 20 ms forward as ~7.3 ms MXU
(scatter matmul) + ~12 ms VPU (window gathers + one-hot mask build),
ASSERTING poor overlap.  This script measures it: the kernel's
``_ablate`` modes compile genuinely different programs isolating the
phases —

    gather_only : panel DMAs + window gathers, no mask, no matmul
    no_matmul   : + one-hot mask build, matmul skipped
    no_mask     : matmul against a cached constant mask (no compare)
    (none)      : full kernel

so  G = t(gather_only), M = t(no_matmul) - G (mask build),
    X = t(no_mask) - G (matmul incl. operand prep).
If t(full) ~ G + M + X the phases serialise; t(full) < that measures
the realised overlap.  Also sweeps group_batch (smaller batches give
Mosaic's scheduler independent VPU/MXU work to interleave) — the
overlap lever VERDICT r3 #3 asks to probe.

Run: python scripts/probe_spmm_overlap.py [--small]
"""

import _bootstrap  # noqa: F401

_bootstrap.setup_jax_cache()

import faulthandler
import signal
import sys
import time

faulthandler.dump_traceback_later(900, repeat=True)
signal.alarm(2700)

import jax
import jax.numpy as jnp
import numpy as np

from dream_gnn_tpu.graph.grouped import grouped_pair_from_arrays
from dream_gnn_tpu.utils.timing import chained_ms, spmm_gather_floor_ms
import dream_gnn_tpu.kernels.pallas_spmm_gather as psg

small = "--small" in sys.argv
n = 4096 if small else 100_000
n_edges = 200_000 if small else 10_000_000
d = 128

rng = np.random.default_rng(0)
src = rng.integers(0, n, n_edges)
dst = rng.integers(0, n, n_edges)
val = rng.random(n_edges).astype(np.float32) + 0.5
x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))

t0 = time.perf_counter()
pair = grouped_pair_from_arrays(src, dst, val, n, n)
print(f"layout {time.perf_counter() - t0:.1f}s "
      f"occ={pair.fwd.occupancy:.2f}", flush=True)
floor = spmm_gather_floor_ms(pair.fwd, d, packed=True)

times = {}
for name, gb, ab in [
    ("full gb=16", 16, None),
    ("full gb=8", 8, None),
    ("full gb=4", 4, None),
    ("gather_only", 16, "gather_only"),
    ("no_matmul", 16, "no_matmul"),
    ("no_mask", 16, "no_mask"),
    ("no_mask gb=8", 8, "no_mask"),
]:
    def fwd(x, gr, gb=gb, ab=ab):
        return psg._spmm_gather_raw(gr.fwd, x, group_batch=gb,
                                    _ablate=ab)
    ms = chained_ms(fwd, x, args=(pair,), n=6, reps=3,
                    floor_ms=floor if ab is None else None, name=name)
    times[name] = ms
    print(f"{name:14s} {ms:7.2f} ms", flush=True)

g = times["gather_only"]
m = times["no_matmul"] - g
xm = times["no_mask"] - g
full = times["full gb=16"]
print(f"\nphases: gathers+DMA G={g:.2f}  mask M={m:.2f}  "
      f"matmul X={xm:.2f}")
print(f"serial sum G+M+X = {g + m + xm:.2f} vs full {full:.2f} "
      f"-> overlap realised {g + m + xm - full:.2f} ms "
      f"({(g + m + xm - full) / max(m + xm, 1e-9):.0%} of M+X)")

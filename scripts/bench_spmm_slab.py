"""A/B the v3 slab-streamed SpMM against the grouped-gather kernel.

Sweeps (tile, span, window, cs, k) on the 10M-edge scale config and
prints the roofline attribution per point (slot occupancy, scatter
MACs, panel bytes).  The round-4 verdict's #1 task: the grouped
kernel's measured binding term was per-group fixed cost x 85k groups
+ a scatter matmul at its MAC floor; the slab design deletes the
former and halves the latter (tile 256).  Target: 10M-edge fwd
<= 16 ms, fwd+bwd <= 32 ms.

Timing: utils/timing.chained_ms (amortised chained dispatch with
floor guards); identical-arg repeats are unreliable through the
relay.
"""

import _bootstrap  # noqa: F401

_bootstrap.setup_jax_cache()

import faulthandler
import signal
import sys
import time

faulthandler.dump_traceback_later(900, repeat=True)
signal.alarm(3300)

import jax
import jax.numpy as jnp
import numpy as np

from dream_gnn_tpu.graph.slabbed import (SUB, slabbed_from_arrays,
                                         slabbed_pair_from_arrays)
from dream_gnn_tpu.utils.timing import (HBM_BYTES_PER_S, MXU_MACS_PER_S,
                                        ImplausibleTiming, chained_ms,
                                        spmm_slab_floor_ms)
import dream_gnn_tpu.kernels.pallas_spmm_slab as pss

small = "--small" in sys.argv
n_src = n_dst = 4096 if small else 100_000
n_edges = 200_000 if small else 10_000_000
d = 128

rng = np.random.default_rng(0)
src = rng.integers(0, n_src, n_edges)
dst = rng.integers(0, n_dst, n_edges)
val = rng.random(n_edges).astype(np.float32) + 0.5
x = jnp.asarray(rng.normal(size=(n_src, d)).astype(np.float32))


def floor_ms(g, packed=True):
    # Floor itself comes from the SHARED helper (one formula for the
    # kernel); this wrapper only adds the roofline attribution terms.
    slots = g.val.size
    macs = slots * g.tile * d
    pr = d // 2 if packed else d
    panel_bytes = (int(g.trans_sb.shape[0]) - 1) * g.span * SUB * pr * 4
    return spmm_slab_floor_ms(g, d, packed), macs, panel_bytes


def roofline(g, ms, packed=True):
    fl, macs, pb = floor_ms(g, packed)
    return (f"occ={g.occupancy:.2f} chunks={g.n_chunks} "
            f"trans={int(g.trans_sb.shape[0]) - 1} "
            f"MXU>={macs / MXU_MACS_PER_S * 1e3:.1f}ms "
            f"DMA={pb / 1e9:.2f}GB "
            f"MXU%={macs / (ms * 1e-3) / MXU_MACS_PER_S * 100:.0f}")


ref = None
best = (np.inf, None)
for (tile, span, window, cs, k) in (
        (256, 128, 5, 8, 16),
        (256, 128, 6, 8, 16),
        (512, 128, 3, 8, 8),
        (512, 128, 3, 16, 8),
        (256, 128, 5, 16, 16),
        (256, 64, 5, 8, 16),
        (128, 128, 8, 8, 32),
):
    print(f"building slabbed layout tile={tile} span={span} "
          f"w={window} cs={cs} k={k}...", flush=True)
    t0 = time.perf_counter()
    try:
        g = slabbed_from_arrays(src, dst, val, n_src, n_dst, tile=tile,
                                span=span, window=window, cs=cs, k=k)
    except ValueError as e:
        print(f"  layout rejected: {e}", flush=True)
        continue
    print(f"  build {time.perf_counter() - t0:.1f}s occ={g.occupancy:.3f}",
          flush=True)
    fl, _, _ = floor_ms(g)

    def fwd(x, gr):
        return pss._spmm_slab_raw(gr, x)

    try:
        out = jax.jit(fwd)(x, g)
        if ref is None:
            ref = jax.block_until_ready(out)
        else:
            rel = float(jnp.max(jnp.abs(out - ref)) /
                        (1e-6 + jnp.max(jnp.abs(ref))))
            assert rel < 2e-2, (tile, span, window, rel)
        name = f"fwd t={tile} s={span} w={window} cs={cs} k={k}"
        ms = chained_ms(fwd, x, args=(g,), n=8, reps=3, floor_ms=fl,
                        name=name)
    except ImplausibleTiming as e:
        print(f"  REJECTED ({e})", flush=True)
        continue
    except Exception as e:
        print(f"  FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
        continue
    print(f"{name:38s} {ms:8.2f} ms "
          f"({n_edges / ms * 1e3:.3e} edges/s)", flush=True)
    print("    " + roofline(g, ms), flush=True)
    if ms < best[0]:
        best = (ms, (tile, span, window, cs, k))

print(f"\nbest fwd: {best[1]} ({best[0]:.2f} ms)", flush=True)

if best[1] is not None and not small:
    tile, span, window, cs, k = best[1]
    pair = slabbed_pair_from_arrays(src, dst, val, n_src, n_dst,
                                    tile=tile, span=span, window=window)
    fl2 = floor_ms(pair.fwd)[0] + floor_ms(pair.bwd)[0]

    def fb(x, gr):
        return jax.grad(lambda y: jnp.sum(pss.spmm_slab(gr, y) ** 2))(x)

    ms = chained_ms(fb, x, args=(pair,), n=6, reps=3, floor_ms=fl2,
                    name="fwd+bwd")
    print(f"fwd+bwd best geometry: {ms:8.2f} ms "
          f"({2 * n_edges / ms * 1e3:.3e} edges/s)", flush=True)

"""A/B the grouped-gather SpMM kernel variants on the TPU.

Sweeps the layout's superblock ``span`` (panel size / occupancy
lever), gather ``window`` (shuffles per group — the dominant VPU
cost) and ``group_batch`` (groups fused per scatter matmul) on the
10M-edge scale config, printing the roofline attribution for each
point: slot occupancy, scatter-MAC count, panel DMA bytes and the
achieved HBM bandwidth / MXU utilisation they imply.  Run after
kernel changes to pick the production defaults in
kernels/pallas_spmm_gather.py (GROUP_BATCH / PACK_PANELS) and
graph/grouped.py (SPAN / WINDOW).

All timings use utils/timing.chained_ms — amortised chained dispatch
with host readback and a physical-floor guard (the round-2
``block_until_ready`` timing printed sub-floor garbage through the
relay; a reading below the layout's HBM/MXU floor now raises instead
of being reported).
"""

import _bootstrap  # noqa: F401  (repo root on sys.path)

_bootstrap.setup_jax_cache()

import faulthandler
import signal
import sys

# Self-watchdog: the remote-TPU tunnel occasionally wedges; a SIGALRM
# exit tears the process down cleanly (device claim released) where an
# external SIGKILL leaves the chip claimed for ~20 min.
faulthandler.dump_traceback_later(900, repeat=True)
signal.alarm(2400)

import time

import jax
import jax.numpy as jnp
import numpy as np

from dream_gnn_tpu.graph.grouped import (LEAD, SUB, TILE_DST_G,
                                         grouped_pair_from_arrays)
from dream_gnn_tpu.utils.timing import (HBM_BYTES_PER_S, MXU_MACS_PER_S,
                                        ImplausibleTiming, chained_ms,
                                        spmm_gather_floor_ms)
import dream_gnn_tpu.kernels.pallas_spmm_gather as psg

small = "--small" in sys.argv
n_src = n_dst = 4096 if small else 100_000
n_edges = 200_000 if small else 10_000_000
d = 128

rng = np.random.default_rng(0)
src = rng.integers(0, n_src, n_edges)
dst = rng.integers(0, n_dst, n_edges)
val = rng.random(n_edges).astype(np.float32) + 0.5

x = jnp.asarray(rng.normal(size=(n_src, d)).astype(np.float32))


def roofline(g, ms, packed=True):
    """Attribution: scatter MACs and panel bytes the layout implies.
    Transition count excludes trans_sb's LEAD trailing pads; panel
    bytes reflect the actual packed flag of the timed variant."""
    slots = g.val.size
    occ = n_edges / slots
    macs = slots * TILE_DST_G * d
    n_trans = int(g.trans_sb.shape[0]) - LEAD
    row_bytes = (d // 2 if packed else d) * 4
    panel_bytes = n_trans * g.span * SUB * row_bytes
    return (f"occ={occ:.2f} scatterMACs={macs / 1e9:.0f}G "
            f"(MXU>= {macs / MXU_MACS_PER_S * 1e3:.1f}ms) "
            f"panelDMA={panel_bytes / 1e9:.2f}GB "
            f"(HBM>= {panel_bytes / HBM_BYTES_PER_S * 1e3:.1f}ms) "
            f"-> BW={panel_bytes / (ms * 1e-3) / 1e9:.0f}GB/s "
            f"MXU={macs / (ms * 1e-3) / MXU_MACS_PER_S * 100:.0f}%")


ref = None
best = (np.inf, None)
results = []
for span, window in ((16, 3), (8, 8)):
    print(f"building grouped layout (span={span} window={window})...",
          flush=True)
    t0 = time.perf_counter()
    pair = grouped_pair_from_arrays(src, dst, val, n_src, n_dst,
                                    span=span, window=window)
    print(f"  build {time.perf_counter() - t0:.1f}s, "
          f"chunks={pair.fwd.n_chunks}, occ={pair.fwd.occupancy:.3f}",
          flush=True)
    floor = spmm_gather_floor_ms(pair.fwd, d, packed=True)
    for gb in (16,):
        def fwd(x, gr, gb=gb):
            return psg._spmm_gather_raw(gr.fwd, x, group_batch=gb)
        out = jax.jit(fwd)(x, pair)
        if ref is None:
            ref = jax.block_until_ready(out)
        else:
            rel = float(jnp.max(jnp.abs(out - ref)) /
                        (1e-6 + jnp.max(jnp.abs(ref))))
            assert rel < 2e-2, (span, window, gb, rel)
        name = f"fwd s={span:2d} w={window} gb={gb:2d}"
        try:
            ms = chained_ms(fwd, x, args=(pair,), n=8, reps=3,
                            floor_ms=floor, name=name)
        except ImplausibleTiming as e:
            print(f"{name:32s} REJECTED ({e})", flush=True)
            continue
        print(f"{name:32s} {ms:8.2f} ms "
              f"({n_edges / ms * 1e3:.3e} edges/s)", flush=True)
        print("    " + roofline(pair.fwd, ms), flush=True)
        results.append((name, ms))
        if ms < best[0]:
            best = (ms, (span, window, gb))

# fwd+bwd on the round-2 baseline shape plus the new default layout.
for span, window in ((16, 3), (8, 8)):
    pair = grouped_pair_from_arrays(src, dst, val, n_src, n_dst,
                                    span=span, window=window)
    floor2 = (spmm_gather_floor_ms(pair.fwd, d, packed=True)
              + spmm_gather_floor_ms(pair.bwd, d, packed=True))

    def fb(x, gr):
        return jax.grad(
            lambda y: jnp.sum(psg.spmm_gather(gr, y) ** 2))(x)
    name = f"fwd+bwd s={span} w={window}"
    ms = chained_ms(fb, x, args=(pair,), n=6, reps=3, floor_ms=floor2,
                    name=name)
    print(f"{name:32s} {ms:8.2f} ms "
          f"({2 * n_edges / ms * 1e3:.3e} edges/s)", flush=True)
    results.append((name, ms))

print(f"\nbest fwd: span={best[1][0]} window={best[1][1]} "
      f"gb={best[1][2]}  ({best[0]:.2f} ms)", flush=True)

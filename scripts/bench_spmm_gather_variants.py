"""A/B the grouped-gather SpMM kernel variants on the TPU.

Sweeps the layout's superblock ``span`` (sub-tiles addressable per
group, the slot-occupancy lever) and ``group_batch`` (groups fused per
scatter matmul) on the 10M-edge scale config, and prints the roofline
attribution for each point: slot occupancy, scatter-MAC count, panel
DMA bytes and the achieved HBM bandwidth / MXU utilisation they imply.
Run after kernel changes to pick the production defaults in
kernels/pallas_spmm_gather.py (GROUP_BATCH / PACK_PANELS) and
graph/grouped.py (SPAN).
"""

import _bootstrap  # noqa: F401  (repo root on sys.path)

import faulthandler
import signal
import sys
import time

# Self-watchdog: the remote-TPU tunnel occasionally wedges; a SIGALRM
# exit tears the process down cleanly (device claim released) where an
# external SIGKILL leaves the chip claimed for ~20 min.
faulthandler.dump_traceback_later(600, repeat=True)
signal.alarm(1500)

import jax
import jax.numpy as jnp
import numpy as np

from dream_gnn_tpu.graph.grouped import (SUB, TILE_DST_G,
                                         grouped_pair_from_arrays)
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


def timed(name, fn, pair, extra="", steps=8):
    # Every timed call gets a DISTINCT input buffer: identical-arg
    # repeats through the axon relay are unreliable (results appear
    # cached — one sweep variant "ran" in 0.01 ms).  Per-call dispatch
    # overhead is <100us against >10ms kernels.
    run = jax.jit(fn)
    xs = [jax.block_until_ready(x * (1.0 + 1e-6 * i))
          for i in range(steps + 1)]
    run(xs[0], pair).block_until_ready()
    best = np.inf
    for i in range(1, steps + 1):
        t0 = time.perf_counter()
        run(xs[i], pair).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    ms = best * 1e3
    print(f"{name:28s} {ms:8.2f} ms  ({n_edges / ms * 1e3:.3e} edges/s)"
          f"  {extra}", flush=True)
    return ms


def roofline(g, ms):
    """Attribution: scatter MACs and panel bytes the layout implies."""
    slots = g.val.size
    occ = n_edges / slots
    macs = slots * TILE_DST_G * d
    n_trans = int(g.trans_sb.shape[0])
    panel_bytes = n_trans * (d // 2) * g.span * SUB * 4   # packed bf16
    return (f"occ={occ:.2f} scatterMACs={macs / 1e9:.0f}G "
            f"(MXU>= {macs / 197e12 * 1e3:.1f}ms) "
            f"panelDMA={panel_bytes / 1e9:.2f}GB "
            f"(HBM>= {panel_bytes / 819e9 * 1e3:.1f}ms) "
            f"-> BW={panel_bytes / (ms * 1e-3) / 1e9:.0f}GB/s "
            f"MXU={macs / (ms * 1e-3) / 197e12 * 100:.0f}%")


ref = None
best = (np.inf, None)
# span=1 at 10M edges overflows SMEM (one transition per group ->
# trans_sb rivals g_meta); the round-1 span-1 numbers are in
# BASELINE.md (34.2 / 65.9 ms).
for span in (2, 4, 8, 16):
    print(f"building grouped layout (span={span})...", flush=True)
    t0 = time.perf_counter()
    pair = grouped_pair_from_arrays(src, dst, val, n_src, n_dst, span=span)
    print(f"  build {time.perf_counter() - t0:.1f}s, "
          f"chunks={pair.fwd.n_chunks}, occ={pair.fwd.occupancy:.3f}",
          flush=True)
    for gb in ((16,) if span != 8 else (4, 8, 16)):
        def fwd(x, gr, gb=gb):
            return psg._spmm_gather_raw(gr.fwd, x, group_batch=gb)
        out = jax.jit(fwd)(x, pair)
        jax.block_until_ready(out)
        if ref is None:
            ref = out
        else:
            rel = float(jnp.max(jnp.abs(out - ref)) /
                        (1e-6 + jnp.max(jnp.abs(ref))))
            assert rel < 2e-2, (span, gb, rel)
        ms = timed(f"fwd span={span:2d} gb={gb:2d}", fwd, pair)
        print("    " + roofline(pair.fwd, ms), flush=True)
        if ms < best[0]:
            best = (ms, (span, gb))

for span in (4, 8):
    pair = grouped_pair_from_arrays(src, dst, val, n_src, n_dst, span=span)
    timed(f"fwd+bwd span={span}",
          lambda x, gr: jax.grad(
              lambda y: jnp.sum(psg.spmm_gather(gr, y) ** 2))(x), pair,
          steps=6)
print(f"\nbest fwd: span={best[1][0]} gb={best[1][1]}", flush=True)

"""Measure the ring sub-block dispatch-floor curve (VERDICT r3 #1).

The ring-overlapped halo exchange (sharding/scale_graph.py:
spmm_gather_sharded_ring) runs S ring steps per shard; at each step a
shard aggregates ONE (n_dst/S x n_src/S) sub-block holding ~E/S^2
edges while ppermute rotates the next source block over ICI.  The
scaling-efficiency model therefore needs the gather kernel's real
per-application time t_sub(S) at sub-block sizes — the fixed
per-launch cost (grid setup, ring zero-init, panel-DMA prologue,
pipeline fill) stops amortising as S grows, and THAT, not ICI
bandwidth, is what bounds ring efficiency on v5e.

This script measures t_sub(S) for S in {1, 2, 4, 8, 16} on the
10M-edge scale config's sub-block geometry (density held at the full
relation's — a ring sub-block has the same edge density as the whole
graph, and auto_span_window picks the same occupancy point the real
ring layout builder uses), then prints the corrected efficiency
model:

    per ring step:  compute = t_sub(S)        (measured, includes
                                               fixed per-call cost)
                    ICI     = n_src*d*bytes / S / BW_ici
    ring fwd total  = S * max(compute, ICI)   (overlapped; XLA's
                                               latency-hiding
                                               scheduler — upper
                                               bound on efficiency)
                    = S * (compute + ICI)     (serialised lower bound)
    eff(S)          = (T_1 / S) / ring_total

The round-3 doc's "ICI is ~3% of compute at ANY ring size" compared
the per-step permute (0.57/S ms) against the per-shard TOTAL compute
(T_1/S) instead of the per-STEP compute (T_1/S^2) — the correct ratio
grows linearly with S (0.0285*S at the measured constants).  This
script replaces that argument with measurement (docs/kernels.md §5).

Run on the real chip: python scripts/bench_ring_subblocks.py
(--quick: fewer reps).  Prints a JSON summary on the last line.
"""

import _bootstrap  # noqa: F401  (repo root on sys.path)

_bootstrap.setup_jax_cache()

import faulthandler
import json
import signal
import sys
import time

faulthandler.dump_traceback_later(900, repeat=True)
signal.alarm(3000)

import jax
import jax.numpy as jnp
import numpy as np

from dream_gnn_tpu.graph.grouped import (auto_span_window,
                                         grouped_pair_from_arrays)
from dream_gnn_tpu.utils.timing import chained_ms, spmm_gather_floor_ms
import dream_gnn_tpu.kernels.pallas_spmm_gather as psg

QUICK = "--quick" in sys.argv

N_NODES = 100_000
N_EDGES = 10_000_000
D = 128
# One v5e ICI link direction, sustained (the constant the round-3 doc
# already used; a ring step moves one (n_src/S, d) bf16 block).
ICI_BYTES_PER_S = 45e9
SHARDS = (1, 2, 4, 8, 16)


def build_subblock(S: int, rng):
    """A layout with the geometry of one ring sub-block at ring size S:
    (n/S x n/S) nodes, E/S^2 edges — same density as the full relation,
    same auto_span_window geometry resolution as
    _sharded_grouped_pairs_ring (full-relation live count / S^2)."""
    n_sub = -(-N_NODES // S)
    e_sub = N_EDGES // (S * S)
    src = rng.integers(0, n_sub, e_sub)
    dst = rng.integers(0, n_sub, e_sub)
    val = rng.random(e_sub).astype(np.float32) + 0.5
    span, window = auto_span_window(N_EDGES // (S * S), n_sub, n_sub)
    return grouped_pair_from_arrays(src, dst, val, n_sub, n_sub,
                                    span=span, window=window), n_sub, e_sub


def main():
    rng = np.random.default_rng(7)
    rows = []
    for S in SHARDS:
        t0 = time.perf_counter()
        pair, n_sub, e_sub = build_subblock(S, rng)
        x = jnp.asarray(rng.normal(size=(n_sub, D)).astype(np.float32))
        print(f"S={S:2d}: sub-block {n_sub}x{n_sub}, {e_sub} edges, "
              f"span={pair.fwd.span} window={pair.fwd.window} "
              f"occ={pair.fwd.occupancy:.2f} "
              f"(build {time.perf_counter() - t0:.1f}s)", flush=True)

        # Chain length scales INVERSELY with kernel size: sub-ms
        # kernels need T_N - T_1 to accumulate far above the relay's
        # few-ms jitter (a first cut with n=8 measured a negative
        # per-application time at S=16).
        n_links = int(np.clip(6_000_000 // e_sub, 6, 128))
        floor_f = spmm_gather_floor_ms(pair.fwd, D, packed=True)
        fwd_ms = chained_ms(
            lambda x, gr: psg._spmm_gather_raw(gr.fwd, x),
            x, args=(pair,), n=n_links,
            reps=2 if QUICK else 3, floor_ms=floor_f,
            name=f"sub fwd S={S}")
        floor_fb = floor_f + spmm_gather_floor_ms(pair.bwd, D, packed=True)
        fb_ms = chained_ms(
            lambda x, gr: jax.grad(
                lambda y: jnp.sum(psg.spmm_gather(gr, y) ** 2))(x),
            x, args=(pair,), n=max(n_links // 2, 4),
            reps=2 if QUICK else 3, floor_ms=floor_fb,
            name=f"sub fwd+bwd S={S}")
        rows.append(dict(S=S, n_sub=n_sub, e_sub=e_sub,
                         occ=round(pair.fwd.occupancy, 3),
                         fwd_ms=round(fwd_ms, 3),
                         fwd_bwd_ms=round(fb_ms, 3)))
        print(f"   fwd {fwd_ms:7.3f} ms   fwd+bwd {fb_ms:7.3f} ms",
              flush=True)
        del pair, x

    t1_fwd = rows[0]["fwd_ms"]
    t1_fb = rows[0]["fwd_bwd_ms"]
    print(f"\nT_1: fwd {t1_fwd:.2f} ms, fwd+bwd {t1_fb:.2f} ms")
    print(f"{'S':>3} {'t_sub f':>9} {'ideal f':>9} {'ici/step':>9} "
          f"{'eff_f ov':>9} {'eff_f ser':>9} {'eff_fb ov':>9}")
    eff = []
    for r in rows[1:]:
        S = r["S"]
        ici = (N_NODES / S) * D * 2 / ICI_BYTES_PER_S * 1e3   # ms/step
        ideal_f = t1_fwd / (S * S)          # per-step ideal compute
        ring_f_ov = S * max(r["fwd_ms"], ici)
        ring_f_ser = S * (r["fwd_ms"] + ici)
        eff_f_ov = (t1_fwd / S) / ring_f_ov
        eff_f_ser = (t1_fwd / S) / ring_f_ser
        # fwd+bwd: backward is the reverse ring — per-step ICI doubles
        # (cotangent blocks rotate too).
        ring_fb_ov = S * max(r["fwd_bwd_ms"], 2 * ici)
        eff_fb_ov = (t1_fb / S) / ring_fb_ov
        eff.append(dict(S=S, ici_ms_per_step=round(ici, 3),
                        eff_fwd_overlap=round(eff_f_ov, 3),
                        eff_fwd_serial=round(eff_f_ser, 3),
                        eff_fwd_bwd_overlap=round(eff_fb_ov, 3)))
        print(f"{S:>3} {r['fwd_ms']:>9.3f} {ideal_f:>9.3f} {ici:>9.3f} "
              f"{eff_f_ov:>9.1%} {eff_f_ser:>9.1%} {eff_fb_ov:>9.1%}")

    break80 = next((e["S"] for e in eff if e["eff_fwd_overlap"] < 0.8),
                   None)
    print(f"\n80% fwd efficiency breaks at S="
          f"{break80 if break80 else f'>{SHARDS[-1]}'}")
    print(json.dumps({"subblocks": rows, "efficiency": eff,
                      "break80_fwd_S": break80}), flush=True)


if __name__ == "__main__":
    main()

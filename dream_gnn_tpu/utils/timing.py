"""Robust kernel timing for the tunneled-TPU environment.

``block_until_ready``-style timing is unreliable through the axon
relay: identical-argument repeat dispatches can appear cached
(round 2's variants bench printed a physically impossible 0.08 ms for
a kernel whose panel DMA alone needs >6 ms), and synchronisation can
also inflate readings by ~20 ms.  Two countermeasures, both mandatory
for any number this repo publishes:

1. **Amortised chained dispatch.**  ``chained_ms`` jits N serialised
   applications of the kernel in ONE dispatch — application k+1's
   input is perturbed by a scalar read from application k's output, so
   XLA cannot parallelise or CSE them — and reads one scalar back to
   the host (a device->host transfer completes only when the whole
   chain has).  Per-application time = (T_N - T_1) / (N - 1): the
   constant dispatch + relay + readback overhead cancels.

2. **Physical-floor guard.**  The caller states the layout's
   HBM-traffic floor (bytes / peak bandwidth) and ``chained_ms``
   REFUSES to return a timing below it — an instrument reading faster
   than the hardware's memory system is broken, not fast.  Benches
   fail loudly instead of publishing "best: <impossible point>" again
   (VERDICT r2, weak #1).
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

# v5e peak HBM bandwidth (bytes/s) used for floor computations.
HBM_BYTES_PER_S = 819e9
# v5e bf16 MACs/s (197 TFLOP/s bf16 => 98.5e12 MAC/s... the MXU does
# multiply+add per MAC, so FLOPs = 2 * MACs).
MXU_MACS_PER_S = 197e12 / 2


class ImplausibleTiming(RuntimeError):
    """Measured time beat a physical floor — the measurement is wrong."""


def _make_chain(fn: Callable, n: int):
    @jax.jit
    def chain(x, *args):
        def body(_, s):
            # The +s*eps perturbation serialises the applications (k+1
            # depends on k's output) without changing the math
            # meaningfully; eps is non-zero so XLA cannot fold it away.
            out = fn(x + s * jnp.float32(1e-30), *args)
            return out.reshape(-1)[0].astype(jnp.float32)

        # fori_loop (not Python unrolling): the kernel appears ONCE in
        # the program, so chain-of-N compiles as fast as chain-of-1 —
        # remote-compile cost of large Pallas kernels dominates
        # otherwise.
        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))
    return chain


def chained_ms(fn: Callable, x: jnp.ndarray, *, args=(), n: int = 8,
               reps: int = 3, floor_ms: Optional[float] = None,
               name: str = "", verbose: bool = False) -> float:
    """Per-application milliseconds of ``fn`` via amortised chained
    dispatch (see module doc).  ``fn(x, *args)`` must return an array;
    its cost must not depend on the tiny perturbation.

    Pass big static data (graph layouts, params) via ``args``, NOT by
    closing over it in ``fn``: closed-over device arrays become jaxpr
    constants, which the fori_loop chain materialises as literal
    constants in the serialized module — a 10M-edge layout blows the
    remote-compile relay's request-size limit (HTTP 413).

    Raises :class:`ImplausibleTiming` if the result lands below
    ``floor_ms`` (pass the layout's HBM/MXU floor).
    """
    if n < 2:
        raise ValueError("need n >= 2 chain links to amortise")
    c1 = _make_chain(fn, 1)
    cn = _make_chain(fn, n)

    # Distinct input buffers per repeat: identical-arg repeats through
    # the relay can be served from a cache.  Materialise before timing.
    # The warm-up buffer (index reps) is DEDICATED — warming with a
    # buffer that is then also timed would reintroduce the
    # identical-argument hazard for the first timed rep.
    xs = [x * (1.0 + 1e-6 * (i + 1)) for i in range(reps + 1)]
    for xi in xs:
        np.asarray(jax.device_get(xi.reshape(-1)[0]))
    warm, xs = xs[-1], xs[:-1]

    float(c1(warm, *args))   # compile + warm
    float(cn(warm, *args))

    def best(chain):
        b = np.inf
        for xi in xs:
            t0 = time.perf_counter()
            float(chain(xi, *args))      # host readback == completion
            b = min(b, time.perf_counter() - t0)
        return b

    t1 = best(c1)
    tn = best(cn)
    ms = (tn - t1) / (n - 1) * 1e3
    if verbose:
        print(f"  [chained {name}] T_1={t1 * 1e3:.2f}ms "
              f"T_{n}={tn * 1e3:.2f}ms -> {ms:.2f}ms/app", flush=True)
    if floor_ms is not None and ms < floor_ms:
        raise ImplausibleTiming(
            f"{name or 'kernel'}: measured {ms:.3f} ms/application is "
            f"below the physical floor {floor_ms:.3f} ms — the "
            f"measurement (not the kernel) is broken; refusing to "
            f"report it")
    return ms


def scale_decoder_floor_ms(layout, h1: int, train: bool) -> float:
    """HBM floor (ms) of one scale-decoder FORWARD application
    (kernels/pallas_scale_decoder.py v3): the XLA small-table buffer
    gather (table read + buffer write), K2's drug-panel sweep + buffer
    read + a1 spill (train) + logits + edge ids.  MXU (batched
    transposes + MLP) is far below the HBM term at H1=128 and not
    modelled."""
    from dream_gnn_tpu.graph.grouped import LEAD, SUB

    g = layout.fwd
    panel_bytes = (int(g.trans_sb.shape[0]) - LEAD) * g.span * SUB \
        * (h1 // 2) * 4
    n_pos = int(np.prod(g.val.shape))
    row = h1 * 2                                # bf16 rows
    hbm = (layout.n_dis * h1 * 4 + n_pos * row          # buf gather
           + panel_bytes + n_pos * row                  # K2 + buf read
           + (n_pos * row if train else 0)              # a1 spill
           + n_pos * 4                                  # logits
           + n_pos * 8)                                 # src + edge ids
    return hbm / HBM_BYTES_PER_S * 1e3


def spmm_slab_floor_ms(g, d: int, packed: bool) -> float:
    """HBM + MXU floor (ms) of one slab-streamed SpMM application
    (kernels/pallas_spmm_slab.py).

    Panel traffic: one (span*SUB x d) source slab per panel transition
    (n_slabs passes over x; trans_sb has LEAD_V3 trailing -1 pads).
    Edge traffic: src/dst/val per slot, read once.  Output: the
    (n_tiles_pad, d, tile) buffer written once.  MXU: tile x d MACs
    per slot edge.
    """
    from dream_gnn_tpu.graph.slabbed import LEAD_V3, SUB

    n_trans = int(g.trans_sb.shape[0]) - LEAD_V3
    bytes_per_row = (d // 2 if packed else d) * 4
    panel_bytes = n_trans * g.span * SUB * bytes_per_row
    slots = int(np.prod(g.val.shape))
    edge_bytes = slots * 12
    out_bytes = g.n_tiles_pad * d * g.tile * 4
    hbm_ms = (panel_bytes + edge_bytes + out_bytes) / HBM_BYTES_PER_S * 1e3
    mxu_ms = slots * g.tile * d / MXU_MACS_PER_S * 1e3
    return max(hbm_ms, mxu_ms)


def spmm_gather_floor_ms(g, d: int, packed: bool) -> float:
    """HBM + MXU floor (ms) of one grouped-gather SpMM application.

    Panel traffic: one (span*SUB x d) source slab per panel transition
    (trans_sb has LEAD trailing -1 pads that never DMA — excluded).
    Edge traffic: src/dst/val (3 x int32-sized) per slot, read once.
    Output: d x n_dst_pad f32 written (+ read for accumulation).
    MXU: TILE_DST x d MACs per slot.
    """
    from dream_gnn_tpu.graph.grouped import LEAD, SUB

    n_trans = int(g.trans_sb.shape[0]) - LEAD
    bytes_per_row = (d // 2 if packed else d) * 4
    panel_bytes = n_trans * g.span * SUB * bytes_per_row
    slots = int(np.prod(g.val.shape))
    edge_bytes = slots * 12
    out_bytes = 2 * d * g.n_dst_pad * 4
    hbm_ms = (panel_bytes + edge_bytes + out_bytes) / HBM_BYTES_PER_S * 1e3
    mxu_ms = slots * g.tile_dst * d / MXU_MACS_PER_S * 1e3
    return max(hbm_ms, mxu_ms)

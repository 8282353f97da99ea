"""Slab-streamed gather SpMM — Pallas TPU kernel (v3 scale path).

``out[n] = sum_e val_e * x[src_e]`` over a SlabbedCoo layout
(graph/slabbed.py).  The round-4 probes showed the grouped kernel's
cost was ~0.15 us of per-group machinery (scalar decode + DMA
boundary branches) x 85k groups plus a scatter matmul already AT its
MAC floor; this kernel deletes the machinery and shrinks the floor:

    per chunk (one dst tile's batch of ``cs`` slots):
        @when(c_wait >= 0):  issue panel DMA for trans+LEAD; wait ours
        @when(c_first):      zero the slab's (k, d, tile) out block
        @when(c_live):
            per slot: one packed meta int -> (ring slot, p0);
                      ``window`` sub-vreg gathers off the resident
                      panel merged by a select tree (same dataflow the
                      grouped kernel proved out — it was never the
                      bottleneck)
            one one-hot MXU matmul (d, cs*128) x (cs*128, tile)
            accumulated into the resident slab at dst tile c_dt

    grid = chunks, ordered slab -> superblock -> dst tile, so the out
    block (the SLAB, not a single tile) revolves only n_slabs times
    and every panel transition lands on a chunk start — there are
    ~n_slabs * n_superblocks ~ 10^2 transitions per 10M edges where
    the grouped layout had ~4 * 10^4, and zero per-group branches.

Panel traffic is n_slabs passes over x (~0.6 GB at the 10M config vs
5.0 GB for the grouped kernel), which decouples the dst tile height
from DMA: ``tile`` drops to 256, halving the scatter matmul MACs that
were the binding floor term.

Backward = the same kernel on the transposed layout
(SlabbedCooPair.bwd); edge values are non-trainable.

Replaces DGL's C++ ``update_all(copy_u, sum)`` SpMM
(/root/reference/layers.py:229-232) at framework scale.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dream_gnn_tpu.graph.slabbed import (LEAD_V3, NSLOTS_V3, SUB,
                                         SlabbedCoo, SlabbedCooPair)

INTERPRET = False

_SUB_SHIFT = SUB.bit_length() - 1

# Pack two bf16 feature channels per 32-bit panel lane (halves panel
# DMA bytes); same scheme and rationale as pallas_spmm_gather.py.
PACK_PANELS = True


def _slab_kernel(meta_ref, dt_ref, slab_ref, first_ref, live_ref,
                 wait_ref, tsb_ref, src_ref, dst_ref, val_ref, xt_hbm,
                 out_ref, panels, sems, rows_sc, *, dtype, packed,
                 span, window, cs, ablate=None):
    i = pl.program_id(0)

    def panel_dma(sl, sb):
        return pltpu.make_async_copy(
            xt_hbm.at[pl.ds(sb * span, span)],
            panels.at[sl], sems.at[sl])

    @pl.when(i == 0)
    def _init():
        # One-hot row-id plane for the scatter compare, built once.
        rows_sc[0] = jax.lax.broadcasted_iota(
            jnp.int32, rows_sc.shape[1:], 0)

    @pl.when(first_ref[i] == 1)
    def _zero():
        out_ref[...] = jnp.zeros_like(out_ref)

    w = wait_ref[i]

    @pl.when(w >= 0)
    def _transition():
        @pl.when(w == 0)
        def _prologue():
            # First live chunk: the transition-0 DMA has no earlier
            # anchor — issue it here, right before its own wait.
            panel_dma(0, tsb_ref[0]).start()

        nxt = tsb_ref[w + LEAD_V3]

        @pl.when(nxt >= 0)
        def _issue():
            panel_dma((w + LEAD_V3) & (NSLOTS_V3 - 1), nxt).start()

        panel_dma(w & (NSLOTS_V3 - 1), 0).wait()

    @pl.when(live_ref[i] == 1)
    def _compute():
        d = out_ref.shape[1]
        pr = panels.shape[2]
        ids_s = src_ref[0]            # (cs, 128) int32
        ids_d = dst_ref[0]
        val = val_ref[0]
        lanes = ids_s & (SUB - 1)
        sels = ids_s >> _SUB_SHIFT    # sub-tile within panel
        parts = []
        for g in range(cs):
            meta = meta_ref[i * cs + g]
            sl = meta >> 8
            p0 = meta & 0xFF
            idx = jnp.broadcast_to(lanes[g:g + 1], (pr, SUB))
            sel = jnp.broadcast_to(sels[g:g + 1], (pr, SUB))
            msgs_g = None
            for p in range(window):
                panel = panels[sl, p0 + p]          # (pr, SUB)
                gp = jnp.take_along_axis(panel, idx, axis=1,
                                         mode="promise_in_bounds")
                msgs_g = gp if msgs_g is None else \
                    jnp.where(sel == p0 + p, gp, msgs_g)
            parts.append(msgs_g)
        msgs = parts[0] if cs == 1 else jnp.concatenate(parts, axis=1)
        if packed:
            hi = pltpu.bitcast(msgs & jnp.uint32(0xFFFF0000),
                               jnp.float32)
            lo = pltpu.bitcast(msgs << 16, jnp.float32)
            msgs = jnp.concatenate([hi, lo], axis=0)    # (d, cs*128)
        v = val.reshape(1, cs * SUB)
        dsts = ids_d.reshape(1, cs * SUB)
        tile = out_ref.shape[2]
        if ablate == "gather_only":
            # Consume msgs cheaply so the gathers stay live; skips the
            # mask build AND the scatter matmul.  WRONG output.
            out_ref[0, :, 0:1] += jnp.sum(
                msgs.astype(jnp.float32), axis=1, keepdims=True)
            return
        eq = rows_sc[0] == jnp.broadcast_to(dsts, (tile, cs * SUB))
        if jnp.dtype(dtype) == jnp.float32:
            m = jnp.where(eq, jnp.broadcast_to(v, (tile, cs * SUB)),
                          jnp.zeros((), dtype))
        else:
            m = eq.astype(dtype)
            msgs = msgs * jnp.broadcast_to(
                v, (d, cs * SUB)).astype(msgs.dtype)
        if ablate == "no_matmul":
            # Mask built, matmul + accumulate skipped.  WRONG output.
            out_ref[0, :, 0:1] += (
                jnp.sum(msgs.astype(jnp.float32), axis=1,
                        keepdims=True)
                + jnp.sum(m.astype(jnp.float32), axis=1,
                          keepdims=True)[:d])
            return
        dtl = dt_ref[i]
        r = jax.lax.dot_general(
            msgs.astype(dtype), m,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if ablate == "no_accum":
            # Matmul runs but lands at a FIXED tile (no dynamic-index
            # read-modify-write).  WRONG output.
            out_ref[0] += r
            return
        out_ref[dtl] += r


def _spmm_slab_raw(g: SlabbedCoo, x: jnp.ndarray,
                   dtype=jnp.bfloat16,
                   packed: bool | None = None,
                   _ablate: str | None = None) -> jnp.ndarray:
    """``_ablate`` is MEASUREMENT-ONLY (scripts/probe_spmm_slab.py):
    'gather_only' / 'no_matmul' / 'no_accum' skip real work to isolate
    the kernel's phases — outputs are WRONG by design."""
    if _ablate not in (None, "gather_only", "no_matmul", "no_accum"):
        raise ValueError(f"unknown ablate mode {_ablate!r}")
    d = x.shape[1]
    span, window, cs = g.span, g.window, g.cs
    if packed is None:
        packed = PACK_PANELS and jnp.dtype(dtype) == jnp.bfloat16
    packed = packed and d % 2 == 0
    x_pad = x if x.shape[0] == g.n_src_pad else jnp.pad(
        x, ((0, g.n_src_pad - x.shape[0]), (0, 0)))
    xt = x_pad.T.astype(jnp.float32)
    if packed:
        half = jax.lax.bitcast_convert_type(
            xt.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
        xt = (half[: d // 2] << 16) | half[d // 2:]
    panel_rows = d // 2 if packed else d
    panel_dtype = jnp.uint32 if packed else jnp.float32
    # auto_geometry budgets the panel ring for PACKED (d/2) rows — an
    # unpacked (fp32 / odd-d) call on a packed-budgeted layout can blow
    # the 16 MiB scoped-VMEM limit at compile time with an opaque
    # remote error.  Check the ACTUAL residents here and fail clearly.
    from dream_gnn_tpu.graph.slabbed import NSLOTS_V3 as _NS
    resident = (_NS * span * SUB * panel_rows * 4
                + 2 * g.k * d * g.tile * 4
                + g.tile * cs * SUB * 4)
    if resident > 15 * 2 ** 20:
        raise ValueError(
            f"slab kernel residents {resident / 2**20:.1f} MiB exceed "
            f"the ~16 MiB scoped-VMEM limit for packed={packed} "
            f"(span={span}, tile={g.tile}, k={g.k}); rebuild the "
            f"layout with slabbed_from_arrays(..., "
            f"d={d if packed else 2 * d}) so auto_geometry budgets "
            f"for unpacked panels")
    xt3 = xt.reshape(panel_rows, g.n_src_pad // SUB, SUB).transpose(
        1, 0, 2)

    edge_spec = pl.BlockSpec((1, cs, SUB), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    out_t = pl.pallas_call(
        functools.partial(_slab_kernel, dtype=dtype, packed=packed,
                          span=span, window=window, cs=cs,
                          ablate=_ablate),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=7,
            grid=(g.n_chunks,),
            in_specs=[
                edge_spec, edge_spec, edge_spec,
                pl.BlockSpec(memory_space=pl.ANY),    # xT3 in HBM
            ],
            out_specs=pl.BlockSpec(
                (g.k, d, g.tile),
                lambda i, meta, dt, slab, first, live, wait, tsb:
                    (slab[i], 0, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((NSLOTS_V3, span, panel_rows, SUB),
                           panel_dtype),
                pltpu.SemaphoreType.DMA((NSLOTS_V3,)),
                pltpu.VMEM((1, g.tile, cs * SUB), jnp.int32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((g.n_tiles_pad, d, g.tile),
                                       jnp.float32),
        interpret=INTERPRET,
    )(g.slot_meta, g.c_dt, g.c_slab, g.c_first, g.c_live, g.c_wait,
      g.trans_sb, g.src_local, g.dst_local, g.val, xt3)
    out = out_t.transpose(1, 0, 2).reshape(d, g.n_dst_pad)
    return out.T[: g.n_dst]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def spmm_slab(pair: SlabbedCooPair, x: jnp.ndarray,
              dtype=jnp.bfloat16) -> jnp.ndarray:
    """Differentiable slab-streamed SpMM."""
    return _spmm_slab_raw(pair.fwd, x, dtype)


def _fwd(pair, x, dtype):
    return _spmm_slab_raw(pair.fwd, x, dtype), pair


def _bwd(dtype, pair, gout):
    dx = _spmm_slab_raw(pair.bwd, gout, dtype)

    def _zero_cot(t):
        if jnp.issubdtype(t.dtype, jnp.floating):
            return jnp.zeros_like(t)
        return np.zeros(t.shape, jax.dtypes.float0)

    return (jax.tree.map(_zero_cot, pair), dx)


spmm_slab.defvjp(_fwd, _bwd)

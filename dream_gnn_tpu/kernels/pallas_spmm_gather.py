"""Sub-vreg gather SpMM — Pallas TPU kernel (large-graph path).

``out[n] = sum_e val_e * x[src_e]`` over a GroupedCoo layout
(graph/grouped.py).  Per chunk (one 512-row dst tile, 16 groups of
<=128 edges each confined to a ``window``-sub-tile window of a
``span``-sub-tile source superblock):

    per superblock transition (host-scheduled, LEAD ahead):
        panel (span, d, 128) <- xT3[sb*span : (sb+1)*span]   # DMA
    per group (panel resident in a NSLOTS ring):
        for p in range(window):                    # W, not span
            msgs |= where(subtile(id) == p0 + p,
                          dynamic_gather(panel[p0 + p], id & 127), .)
    per batch of GB groups:
        M (TD, GB*128)  = (iota16 == dst ids)      # 16-bit VPU compare
        accT (d, TD)   += msgsT contract_e M       # one MXU matmul

The hardware gather works because each shuffle's table spans exactly
one vreg of lanes (Mosaic's dynamic_gather limit).  The round-2 kernel
extended the addressable range with a select tree over ALL ``span``
sub-tiles of the superblock; since edges inside a group are sorted by
source sub-tile, the touched sub-tiles are a consecutive range the
layout now caps at ``window`` (graph/grouped.py) — the kernel gathers
exactly ``window`` sub-tiles starting at the group's base ``p0``
(decoded from the packed meta), cutting the dominant per-group VPU
cost from ``span`` shuffles+selects to ``window`` while keeping
span-sized panels for DMA amortisation and occupancy.  The per-group
body stays branch-free values-only dataflow (measured in round 1: a
variant that gated each sub-tile's shuffle behind a scalar ``pl.when``
serialised Mosaic's software pipeline and lost more to stalls than the
skipped shuffles saved — a dynamic ADDRESS, unlike dynamic control
flow, keeps the pipeline static).  A group batch that is all padding
does skip its scatter matmul — one scalar test per batch — which keeps
the sharded path's chunk-count padding near-free.

The scatter mask (one-hot of each edge's dst row, the second-largest
VPU cost after the gathers) is a 32-bit int compare against a row-id
plane materialised once in VMEM scratch — v5e has no 16-bit-packed
compare of any kind (see the negative-result note below), so the only
win available is skipping the per-chunk iota regeneration.

Source panels stream from HBM through an NSLOTS-deep VMEM ring with
explicit async DMA issued LEAD transitions ahead (schedule precomputed
on the host, where the whole group stream is known), so x never needs
to fit in VMEM and copies ride under compute.  The ring is zero-filled
once at grid start: padding groups (meta=PAD_META) still execute their
window gathers against slot ``tid % NSLOTS`` of a NEGATIVE tid —
possibly a slot whose panel DMA never ran — and their ``val == 0``
nullifies the contribution only if the gathered bits are finite
(NaN * 0 = NaN would poison dst row 0 of a mixed live/padding batch).
Zeroing makes every slot finite at all times; live panels are finite
because x is.

Backward = SpMM on the transposed grouping (GroupedCooPair.bwd); edge
values are non-trainable.

This kernel targets the synthetic scale config (100k x 100k, ~10M
edges) where XLA's segment_sum lowering is scatter-serialised; it
replaces DGL's C++ `update_all(copy_u, sum)` SpMM
(/root/reference/layers.py:229-232) at scales the reference never
reaches.  The dense-mask path stays optimal for the real (tiny)
datasets and the one-hot blocked kernel for mid-size graphs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dream_gnn_tpu.graph.grouped import (LEAD, NSLOTS, SUB, GroupedCoo,
                                         GroupedCooPair, p0_bits_for)

INTERPRET = False

_SUB_SHIFT = SUB.bit_length() - 1
assert 1 << _SUB_SHIFT == SUB, "SUB must be a power of two"

# Groups fused into one scatter matmul.  The per-group scatter is a
# tiny (d, 128) x (128, TILE_DST) MXU op whose launch/VPU overhead
# (mask build, dtype casts, accumulate) dominates at 128-edge
# granularity; batching GB groups widens it to (d, GB*128) x
# (GB*128, TILE_DST) — identical MACs, 1/GB the launches.  Measured at
# the 10M-edge scale config (scripts/bench_spmm_gather_variants.py).
GROUP_BATCH = 16

# Pack two bf16 feature channels per 32-bit panel lane (halves panel
# DMA bytes).  bf16 is fp32's top half, so channel i unpacks as
# ``bitcast(v & 0xffff0000, f32)`` and channel i + d/2 as
# ``bitcast(v << 16, f32)`` — no interleave, just a static sublane
# concat.  Requires even d; gather indices stay 32-bit (Mosaic's
# dynamic_gather bitwidth rule).  Numerics: panel features round to
# bf16, matching the bf16 scatter-matmul operand precision the scale
# path already uses — so the default applies only when the scatter
# dtype is bf16 (fp32 callers keep exact fp32 panels).
PACK_PANELS = True

# Negative result, documented so nobody re-plumbs it (there is NO
# mask16 knob — a parameter that silently measured the identical
# program was removed per round-3 advice): building the dst one-hot
# scatter mask with 16-bit compares (two lanes per vreg word) is
# impossible on v5e.  Mosaic rejects packed i16 iota, packed i16
# compares ("Target does not support this comparison"), the f16 type
# outright ("Unsupported type in mosaic dialect"), AND packed bf16
# compares (same cmpf rejection on vector<...x2xbf16>) — the v5e VPU
# simply has no 16-bit-packed compare.  The mask-build therefore stays
# a 32-bit int compare; what we DO save is the per-chunk (512, 2048)
# iota regeneration, materialised once into VMEM scratch instead (the
# VPU reads operands from VMEM natively, so the resident plane costs
# no generation ops on later chunks).


def _spmm_gather_kernel(meta_ref, trans_sb_ref, dst_tile_ref, first_ref,
                        src_ref, dst_ref, val_ref, xt_hbm, out_ref,
                        panels, sems, rows_sc, *extra_sc, dtype,
                        group_batch, packed, span, window, gpc,
                        ablate=None):
    i = pl.program_id(0)
    p0b = p0_bits_for(span)
    shift = p0b + window

    @pl.when(i == 0)
    def _zero_ring():
        # Finite-bits invariant for padding groups (see module doc).
        panels[...] = jnp.zeros_like(panels)
        # Row-id plane for the scatter one-hot compare, computed ONCE
        # per launch: later chunks read it as a VMEM compare operand
        # instead of regenerating a (TILE_DST_G, gb*SUB) iota each.
        rows_sc[0] = jax.lax.broadcasted_iota(
            jnp.int32, rows_sc.shape[1:], 0)
        if ablate == "no_mask":
            # Fixed (wrong) diagonal-ish mask so the scatter matmul
            # runs with no per-batch compare/cast (see ablate note in
            # _spmm_gather_raw).
            sh = extra_sc[0].shape[1:]
            extra_sc[0][0] = (
                jax.lax.broadcasted_iota(jnp.int32, sh, 0)
                == jax.lax.broadcasted_iota(jnp.int32, sh, 1)
                % sh[0]).astype(extra_sc[0].dtype)

    @pl.when(first_ref[i] == 1)
    def _zero():
        out_ref[:] = jnp.zeros_like(out_ref)

    d = out_ref.shape[0]
    pr = panels.shape[2]          # panel rows: d (fp32) or d/2 (packed)
    ids_s = src_ref[0]            # (G, 128) int32 in [0, span*128)
    ids_d = dst_ref[0]
    val = val_ref[0]              # (G, 128) f32
    lanes = ids_s & (SUB - 1)
    sels = ids_s >> _SUB_SHIFT    # sub-tile of each edge's source row
    gb = group_batch
    n_batches = gpc // gb

    def panel_dma(sl, sb):
        return pltpu.make_async_copy(
            xt_hbm.at[pl.ds(sb * span, span)],
            panels.at[sl], sems.at[sl])

    touch_mask = (1 << window) - 1
    meta_prev = None
    for b in range(n_batches):
        base = b * gb
        parts = []
        for g in range(gb):
            gid = i * gpc + base + g
            meta = meta_ref[gid]
            tid = meta >> shift              # panel transition id
            p0 = (meta >> window) & ((1 << p0b) - 1) if p0b else 0
            sl = tid & (NSLOTS - 1)          # ring slot (0..3 even for
            #                                  PAD_META's negative tid)
            if base + g == 0:
                # Stream prologue: the first LEAD panel DMAs have no
                # earlier anchor — issue them at the very first group.
                @pl.when(i == 0)
                def _prologue():
                    for k in range(LEAD):
                        sbk = trans_sb_ref[k]

                        @pl.when(sbk >= 0)
                        def _pstart(sbk=sbk, k=k):
                            panel_dma(k & (NSLOTS - 1), sbk).start()

            # A wait fires at each transition boundary (first live
            # group whose tid differs from its predecessor's; PAD_META
            # shifts to a negative tid so post-padding groups re-wait);
            # it first issues the DMA for transition tid + LEAD so
            # copies stay LEAD transitions ahead of their consumer.
            # The predecessor's meta is cached from the previous
            # unrolled iteration — only a chunk's first group rereads
            # SMEM (the per-group scalar path is a measured ~0.15 us
            # of the kernel's per-group cost; see docs §4).
            prev_meta = meta_ref[jnp.maximum(gid - 1, 0)] \
                if meta_prev is None else meta_prev
            boundary = (tid != (prev_meta >> shift)) | (gid == 0)
            meta_prev = meta

            @pl.when((meta >= 0) & boundary)
            def _wait(tid=tid, sl=sl):
                sb_next = trans_sb_ref[tid + LEAD]

                @pl.when(sb_next >= 0)
                def _start(sb_next=sb_next, tid=tid):
                    panel_dma((tid + LEAD) & (NSLOTS - 1),
                              sb_next).start()

                panel_dma(sl, 0).wait()  # descriptor only sizes the wait

            # Gather this group's messages: one hardware shuffle per
            # WINDOW sub-tile starting at the group's base p0 (a
            # dynamic address, not a branch — the pipeline stays
            # static), merged by a value-level select tree.
            gl = base + g
            idx = jnp.broadcast_to(lanes[gl:gl + 1], (pr, SUB))
            sel = jnp.broadcast_to(sels[gl:gl + 1], (pr, SUB))
            msgs_g = None
            for p in range(window):
                panel = panels[sl, p0 + p]         # (pr, SUB)
                gp = jnp.take_along_axis(panel, idx, axis=1,
                                         mode="promise_in_bounds")
                msgs_g = gp if msgs_g is None else \
                    jnp.where(sel == p0 + p, gp, msgs_g)
            parts.append(msgs_g)

        batch_live = meta_ref[i * gpc + base] & touch_mask
        for g in range(1, gb):
            batch_live |= meta_ref[i * gpc + base
                                   + g] & touch_mask

        @pl.when(batch_live != 0)
        def _scatter(base=base, parts=parts):
            msgs = parts[0] if gb == 1 else jnp.concatenate(parts, axis=1)
            if packed:
                hi = pltpu.bitcast(
                    msgs & jnp.uint32(0xFFFF0000), jnp.float32)
                lo = pltpu.bitcast(msgs << 16, jnp.float32)
                msgs = jnp.concatenate([hi, lo], axis=0)   # (d, gb*128)
            v = val[base:base + gb].reshape(1, gb * SUB)
            dsts = ids_d[base:base + gb].reshape(1, gb * SUB)
            td = out_ref.shape[1]
            if ablate == "gather_only":
                # Consume msgs cheaply so the gathers stay live.
                out_ref[:, 0:1] += jnp.sum(msgs.astype(jnp.float32),
                                           axis=1, keepdims=True)
                return
            if ablate == "no_mask":
                m = extra_sc[0][0]
                msgs = msgs * jnp.broadcast_to(
                    v, (d, gb * SUB)).astype(msgs.dtype)
            else:
                eq = rows_sc[0] == jnp.broadcast_to(dsts,
                                                    (td, gb * SUB))
                if jnp.dtype(dtype) == jnp.float32:
                    # Edge values ride the one-hot mask: the select
                    # emits val_e at the [dst_e, e] element instead of
                    # 1.0 — no separate (d, gb*128) multiply over the
                    # messages and no bool->dtype cast.  f32 only: the
                    # i1 of a 32-bit compare cannot relayout to a
                    # 16-bit select's tiling (Mosaic "Invalid
                    # relayout"), so the bf16 path keeps the classic
                    # cast+mul below.
                    m = jnp.where(
                        eq, jnp.broadcast_to(v, (td, gb * SUB)),
                        jnp.zeros((), dtype))
                else:
                    m = eq.astype(dtype)
                    msgs = msgs * jnp.broadcast_to(
                        v, (d, gb * SUB)).astype(msgs.dtype)
            if ablate == "no_matmul":
                # Mask built, matmul skipped; consume both operands.
                out_ref[:, 0:1] += (
                    jnp.sum(msgs.astype(jnp.float32), axis=1,
                            keepdims=True)
                    + jnp.sum(m.astype(jnp.float32), axis=1,
                              keepdims=True)[:d])
                return
            out_ref[:] += jax.lax.dot_general(
                msgs.astype(dtype), m,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)


def _spmm_gather_raw(g: GroupedCoo, x: jnp.ndarray,
                     dtype=jnp.bfloat16,
                     group_batch: int | None = None,
                     packed: bool | None = None,
                     _ablate: str | None = None) -> jnp.ndarray:
    """``_ablate`` is MEASUREMENT-ONLY (scripts/probe_spmm_overlap.py):
    'gather_only' / 'no_mask' / 'no_matmul' skip real work to isolate
    the kernel's VPU/MXU phases — outputs are WRONG by design (unlike
    the round-3 mask16 flag, each mode compiles a genuinely different
    program; tests pin that the timings differ)."""
    if _ablate not in (None, "gather_only", "no_mask", "no_matmul"):
        raise ValueError(f"unknown ablate mode {_ablate!r}")
    gpc = g.src_local.shape[1]   # groups per chunk (layout-adaptive)
    if group_batch is None:
        gb = min(GROUP_BATCH, gpc)   # default clamps to small layouts
    else:
        gb = group_batch
        if gb > gpc:
            # An EXPLICIT group_batch above gpc would silently time the
            # identical program as group_batch=gpc — reject so sweeps
            # cannot record a fake null result.
            raise ValueError(f"group_batch {gb} > layout gpc {gpc}")
    if gpc % gb:
        raise ValueError(f"group_batch {gb} must divide gpc {gpc}")
    d = x.shape[1]
    span, window = g.span, g.window
    if packed is None:
        packed = PACK_PANELS and jnp.dtype(dtype) == jnp.bfloat16
    packed = packed and d % 2 == 0
    x_pad = x if x.shape[0] == g.n_src_pad else jnp.pad(
        x, ((0, g.n_src_pad - x.shape[0]), (0, 0)))
    # Panels stay 32-bit: tpu.dynamic_gather requires the data bitwidth
    # to match the (int32) index bitwidth. ``dtype`` applies to the
    # scatter matmul operands only.  ``packed`` fits two bf16 channels
    # per 32-bit lane instead (see PACK_PANELS).
    xt = x_pad.T.astype(jnp.float32)               # (d, n_src_pad)
    if packed:
        half = jax.lax.bitcast_convert_type(
            xt.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
        xt = (half[: d // 2] << 16) | half[d // 2:]   # (d/2, n) u32
    panel_rows = d // 2 if packed else d
    panel_dtype = jnp.uint32 if packed else jnp.float32
    # (n_subtiles, pr, SUB): sub-tile-major so the kernel can index a
    # (pr, SUB) gather block with a DYNAMIC leading index (the group's
    # p0) and panel DMAs are contiguous span-slab copies.
    xt3 = xt.reshape(panel_rows, g.n_src_pad // SUB, SUB).transpose(
        1, 0, 2)

    edge_spec = pl.BlockSpec((1, gpc, SUB),
                             lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    scratch = [
        pltpu.VMEM((NSLOTS, span, panel_rows, SUB), panel_dtype),
        pltpu.SemaphoreType.DMA((NSLOTS,)),
        pltpu.VMEM((1, g.tile_dst, gb * SUB), jnp.int32),
    ]
    if _ablate == "no_mask":
        scratch.append(pltpu.VMEM((1, g.tile_dst, gb * SUB), dtype))
    out_t = pl.pallas_call(
        functools.partial(_spmm_gather_kernel, dtype=dtype,
                          group_batch=gb, packed=packed, span=span,
                          window=window, gpc=gpc, ablate=_ablate),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,    # meta, trans_sb, dst_tile, first
            grid=(g.n_chunks,),
            in_specs=[
                edge_spec, edge_spec, edge_spec,
                pl.BlockSpec(memory_space=pl.ANY),     # xT3 stays in HBM
            ],
            out_specs=pl.BlockSpec(
                (d, g.tile_dst),
                lambda i, meta, tsb, dt, first: (0, dt[i]),
                memory_space=pltpu.VMEM),
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct((d, g.n_dst_pad), jnp.float32),
        interpret=INTERPRET,
    )(g.g_meta, g.trans_sb, g.dst_tile, g.first_of_dst,
      g.src_local, g.dst_local, g.val, xt3)
    return out_t.T[: g.n_dst]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def spmm_gather(pair: GroupedCooPair, x: jnp.ndarray,
                dtype=jnp.bfloat16) -> jnp.ndarray:
    """Differentiable grouped-gather SpMM."""
    return _spmm_gather_raw(pair.fwd, x, dtype)


def _fwd(pair, x, dtype):
    return _spmm_gather_raw(pair.fwd, x, dtype), pair


def _bwd(dtype, pair, gout):
    dx = _spmm_gather_raw(pair.bwd, gout, dtype)

    def _zero_cot(x):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return jnp.zeros_like(x)
        return np.zeros(x.shape, jax.dtypes.float0)

    return (jax.tree.map(_zero_cot, pair), dx)


spmm_gather.defvjp(_fwd, _bwd)

"""Sub-vreg gather SpMM — Pallas TPU kernel (large-graph path).

``out[n] = sum_e val_e * x[src_e]`` over a GroupedCoo layout
(graph/grouped.py).  Per chunk (one 512-row dst tile, 16 groups of
<=128 edges each confined to a 128-row src sub-tile):

    for each group g (double-buffered HBM DMA of its source panel):
        panel (d, 128)  <- xT[:, subtile_g * 128 : +128]     # 32 KB DMA
        msgsT (d, 128)  = dynamic_gather(panel, src ids)     # hardware
                          * val                              # shuffle
        M (TD, 128)     = (iota_dst == dst ids)              # VPU
        accT (d, TD)   += msgsT contract_e M                 # one MXU

The hardware gather works because each group's table spans exactly one
vreg of lanes (Mosaic's dynamic_gather limit); the scatter matmul costs
TILE_DST * d MACs per edge — half the one-hot kernel's bill, with the
gather side free.  Source panels stream from HBM through a two-slot
VMEM scratch with explicit async DMA, so x never needs to fit in VMEM
(the one-hot kernel's other limit).

Backward = SpMM on the transposed grouping (GroupedCooPair.bwd); edge
values are non-trainable.

This kernel targets the synthetic scale config (100k x 100k, ~10M
edges) where XLA's segment_sum lowering is scatter-serialised; the
dense-mask path stays optimal for the real (tiny) datasets and the
one-hot blocked kernel for mid-size graphs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dream_gnn_tpu.graph.grouped import (GROUPS_PER_CHUNK, SUB, TILE_DST_G,
                                         GroupedCoo, GroupedCooPair)

INTERPRET = False

# Groups fused into one scatter matmul.  The per-group scatter is a
# tiny (d, 128) x (128, TILE_DST) MXU op whose launch/VPU overhead
# (mask build, dtype casts, accumulate) dominates at 128-edge
# granularity; batching GB groups widens it to (d, GB*128) x
# (GB*128, TILE_DST) — identical MACs, 1/GB the launches — and deepens
# the DMA pipeline from 2 to 2*GB panels in flight.  Measured at the
# 10M-edge scale config (scripts/bench_spmm_gather_variants.py):
# gb=1 44.9 ms fwd -> gb=8 37.1 ms (34.2 ms with packed panels).
GROUP_BATCH = 8

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


def _spmm_gather_kernel(sub_ref, dst_tile_ref, first_ref,
                        src_ref, dst_ref, val_ref, xt_hbm, out_ref,
                        scratch, sems, *, dtype, group_batch, packed):
    i = pl.program_id(0)

    @pl.when(first_ref[i] == 1)
    def _zero():
        out_ref[:] = jnp.zeros_like(out_ref)

    d = out_ref.shape[0]
    ids_s = src_ref[0]        # (G, 128) int32
    ids_d = dst_ref[0]
    val = val_ref[0]          # (G, 128) f32
    gb = group_batch
    slots = scratch.shape[0]
    n_batches = GROUPS_PER_CHUNK // gb

    def dma(slot, g):
        sub = sub_ref[i * GROUPS_PER_CHUNK + g]
        return pltpu.make_async_copy(
            xt_hbm.at[:, pl.ds(sub * SUB, SUB)],
            scratch.at[slot], sems.at[slot])

    for g in range(gb):
        dma(g % slots, g).start()
    acc = jnp.zeros((d, TILE_DST_G), jnp.float32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (TILE_DST_G, gb * SUB), 0)
    for b in range(n_batches):
        base = b * gb
        if b + 1 < n_batches:
            for g in range(gb):
                dma((base + gb + g) % slots, base + gb + g).start()
        parts = []
        for g in range(gb):
            gid = base + g
            dma(gid % slots, gid).wait()
            panel = scratch[gid % slots]         # (d, 128) / (d/2, 128)
            idx = jnp.broadcast_to(ids_s[gid:gid + 1],
                                   (panel.shape[0], SUB))
            msgs = jnp.take_along_axis(panel, idx, axis=1,
                                       mode="promise_in_bounds")
            if packed:
                hi = pltpu.bitcast(
                    msgs & jnp.uint32(0xFFFF0000), jnp.float32)
                lo = pltpu.bitcast(msgs << 16, jnp.float32)
                msgs = jnp.concatenate([hi, lo], axis=0)   # (d, 128)
            parts.append(msgs * jnp.broadcast_to(
                val[gid:gid + 1], (d, SUB)).astype(msgs.dtype))
        msgs = parts[0] if gb == 1 else jnp.concatenate(parts, axis=1)
        dsts = ids_d[base:base + gb].reshape(1, gb * SUB)
        m = (rows == jnp.broadcast_to(dsts, (TILE_DST_G, gb * SUB)))
        acc = acc + jax.lax.dot_general(
            msgs.astype(dtype), m.astype(dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    out_ref[:] += acc


def _spmm_gather_raw(g: GroupedCoo, x: jnp.ndarray,
                     dtype=jnp.bfloat16,
                     group_batch: int | None = None,
                     packed: bool | None = None) -> jnp.ndarray:
    gb = GROUP_BATCH if group_batch is None else group_batch
    if GROUPS_PER_CHUNK % gb:
        raise ValueError(f"group_batch {gb} must divide {GROUPS_PER_CHUNK}")
    d = x.shape[1]
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

    edge_spec = pl.BlockSpec((1, GROUPS_PER_CHUNK, SUB),
                             lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    slots = 2 * gb
    panel_rows = d // 2 if packed else d
    panel_dtype = jnp.uint32 if packed else jnp.float32
    out_t = pl.pallas_call(
        functools.partial(_spmm_gather_kernel, dtype=dtype,
                          group_batch=gb, packed=packed),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,    # subtile, dst_tile, first
            grid=(g.n_chunks,),
            in_specs=[
                edge_spec, edge_spec, edge_spec,
                pl.BlockSpec(memory_space=pl.ANY),     # xT stays in HBM
            ],
            out_specs=pl.BlockSpec((d, TILE_DST_G),
                                   lambda i, st, dt, first: (0, dt[i]),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((slots, panel_rows, SUB), panel_dtype),
                pltpu.SemaphoreType.DMA((slots,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((d, g.n_dst_pad), jnp.float32),
        interpret=INTERPRET,
    )(g.subtile, g.dst_tile, g.first_of_dst,
      g.src_local, g.dst_local, g.val, xt)
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

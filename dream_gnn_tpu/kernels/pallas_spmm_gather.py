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


def _spmm_gather_kernel(sub_ref, dst_tile_ref, first_ref,
                        src_ref, dst_ref, val_ref, xt_hbm, out_ref,
                        scratch, sems, *, dtype):
    i = pl.program_id(0)

    @pl.when(first_ref[i] == 1)
    def _zero():
        out_ref[:] = jnp.zeros_like(out_ref)

    d = out_ref.shape[0]
    ids_s = src_ref[0]        # (G, 128) int32
    ids_d = dst_ref[0]
    val = val_ref[0]          # (G, 128) f32

    def dma(slot, g):
        sub = sub_ref[i * GROUPS_PER_CHUNK + g]
        return pltpu.make_async_copy(
            xt_hbm.at[:, pl.ds(sub * SUB, SUB)],
            scratch.at[slot], sems.at[slot])

    dma(0, 0).start()
    acc = jnp.zeros((d, TILE_DST_G), jnp.float32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (TILE_DST_G, SUB), 0)
    for g in range(GROUPS_PER_CHUNK):
        if g + 1 < GROUPS_PER_CHUNK:
            dma((g + 1) % 2, g + 1).start()
        dma(g % 2, g).wait()
        panel = scratch[g % 2]                       # (d, 128)
        idx = jnp.broadcast_to(ids_s[g:g + 1], (d, SUB))
        msgs = jnp.take_along_axis(panel, idx, axis=1,
                                   mode="promise_in_bounds")
        msgs = msgs * jnp.broadcast_to(val[g:g + 1], (d, SUB)).astype(
            msgs.dtype)
        m = (rows == jnp.broadcast_to(ids_d[g:g + 1], (TILE_DST_G, SUB)))
        acc = acc + jax.lax.dot_general(
            msgs.astype(dtype), m.astype(dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    out_ref[:] += acc


def _spmm_gather_raw(g: GroupedCoo, x: jnp.ndarray,
                     dtype=jnp.bfloat16) -> jnp.ndarray:
    d = x.shape[1]
    x_pad = x if x.shape[0] == g.n_src_pad else jnp.pad(
        x, ((0, g.n_src_pad - x.shape[0]), (0, 0)))
    # Panels stay fp32: tpu.dynamic_gather requires the data bitwidth to
    # match the (int32) index bitwidth. ``dtype`` applies to the scatter
    # matmul operands only.
    xt = x_pad.T.astype(jnp.float32)               # (d, n_src_pad)

    edge_spec = pl.BlockSpec((1, GROUPS_PER_CHUNK, SUB),
                             lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    out_t = pl.pallas_call(
        functools.partial(_spmm_gather_kernel, dtype=dtype),
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
                pltpu.VMEM((2, d, SUB), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
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

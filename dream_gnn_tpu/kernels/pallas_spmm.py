"""Blocked-COO SpMM — Pallas TPU kernel.

``out[d] = sum_e val_e * x[src_e]`` over a graph in the BlockedCoo
layout (graph/blocked.py).  Per grid step (one edge chunk):

    x_tile   <- pipelined DMA, selected by the chunk's src_tile id
    P_src    = onehot(src_local) * val               # weighted gather
    for each 128-edge row r:
        msgs_r    = P_src[r] @ x_tile                # MXU gather
        out_tile += P_dst[r]^T @ msgs_r              # MXU scatter

Both the gather and the scatter are one-hot matmuls against
VMEM-resident tiles, so the kernel runs at MXU speed instead of the
scatter-serialised ``segment_sum`` lowering.  Edge ids are stored as
(chunk, 16, 128) int32 tiles: TPU HBM tiling pads an (N, 1) int column
to (N, 128) — a 128x memory blowup at 10M edges — and all index math
stays 2D/3D (Mosaic has no 1D vector ops).  The output block is
revisited across the chunks of one dst tile (chunks are
dst-tile-sorted) and zeroed on the first visit.

Design note — why one-hot and not a true gather: Mosaic's
``tpu.dynamic_gather`` only shuffles within a single vreg (gather
tables are capped at 128 lanes / 8 sublanes), so a 512-row tile gather
is "Not implemented: Multiple source vregs along gather dimension".
The one-hot matmul costs (TILE_SRC + TILE_DST) * d MACs per edge —
MXU-cheap for tiles up to ~512 — which makes this kernel strongest on
small-to-medium or locality-structured graphs; on a uniform-random
10M-edge graph it roughly matches XLA's segment_sum.  A sub-vreg
tiled gather variant is the planned next iteration.

Backward: SpMM with the transposed graph (A^T @ g), provided by the
pre-built transpose layout in BlockedCooPair; edge values are
non-trainable (degree norms / augmentation masks), so no cotangent
flows to them.

Replaces: DGL C++ ``update_all(copy_u, sum)`` (layers.py:229-232) and
torch cuSPARSE ``th.spmm`` (layers.py:312) for graphs too large for
the dense-mask formulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dream_gnn_tpu.graph.blocked import (BlockedCoo, BlockedCooPair,
                                         EDGE_CHUNK, TILE_DST, TILE_SRC)
from dream_gnn_tpu.kernels.common import onehot3 as _onehot3

INTERPRET = False
_LANE = 128
_ROWS = EDGE_CHUNK // _LANE



def _spmm_kernel(src_tile_ref, dst_tile_ref, first_ref,
                 src_ref, dst_ref, val_ref, x_ref, out_ref, *, dtype):
    i = pl.program_id(0)

    @pl.when(first_ref[i] == 1)
    def _zero():
        out_ref[:] = jnp.zeros_like(out_ref)

    ids_s = src_ref[0]                      # (R, 128) int32
    ids_d = dst_ref[0]
    val3 = val_ref[0]                       # (R, 128) f32
    # Fold the edge weight into the gather one-hot: weighted gather.
    p_src = _onehot3(ids_s, TILE_SRC, jnp.float32) * val3[:, :, None]
    p_dst = _onehot3(ids_d, TILE_DST, dtype)
    x = x_ref[:].astype(dtype)
    acc = jnp.zeros_like(out_ref)
    for r in range(_ROWS):
        msgs = jnp.dot(p_src[r].astype(dtype), x,
                       preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(p_dst[r].T, msgs.astype(dtype),
                            preferred_element_type=jnp.float32)
    out_ref[:] += acc


def _edge_tiles(a: jnp.ndarray) -> jnp.ndarray:
    """(C, EDGE_CHUNK) -> (C, ROWS, 128)."""
    return a.reshape(a.shape[0], _ROWS, _LANE)


def _spmm_blocked_raw(g: BlockedCoo, x: jnp.ndarray,
                      dtype=jnp.bfloat16) -> jnp.ndarray:
    """SpMM over one blocked layout; x (n_src, d) fp32 -> (n_dst, d)."""
    d = x.shape[1]
    x_pad = x if x.shape[0] == g.n_src_pad else jnp.pad(
        x, ((0, g.n_src_pad - x.shape[0]), (0, 0)))

    edge_spec = pl.BlockSpec((1, _ROWS, _LANE), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_spmm_kernel, dtype=dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,       # src_tile, dst_tile, first
            grid=(g.n_chunks,),
            in_specs=[
                edge_spec, edge_spec, edge_spec,
                pl.BlockSpec((TILE_SRC, d),
                             lambda i, st, dt, first: (st[i], 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE_DST, d),
                                   lambda i, st, dt, first: (dt[i], 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((g.n_dst_pad, d), jnp.float32),
        interpret=INTERPRET,
    )(g.src_tile, g.dst_tile, g.first_of_dst,
      _edge_tiles(g.src_local), _edge_tiles(g.dst_local),
      _edge_tiles(g.val), x_pad)
    return out[: g.n_dst]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def spmm_blocked(pair: BlockedCooPair, x: jnp.ndarray,
                 dtype=jnp.bfloat16) -> jnp.ndarray:
    """Differentiable blocked SpMM (gradient uses the transpose layout)."""
    return _spmm_blocked_raw(pair.fwd, x, dtype)


def _spmm_fwd(pair, x, dtype):
    return _spmm_blocked_raw(pair.fwd, x, dtype), pair


def _spmm_bwd(dtype, pair, gout):
    dx = _spmm_blocked_raw(pair.bwd, gout, dtype)

    def _zero_cot(x):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return jnp.zeros_like(x)
        return np.zeros(x.shape, jax.dtypes.float0)

    # Edge values carry degree norms / augmentation masks, not trainable
    # parameters — zero cotangent for the whole graph structure.
    return (jax.tree.map(_zero_cot, pair), dx)


spmm_blocked.defvjp(_spmm_fwd, _spmm_bwd)

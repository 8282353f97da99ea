"""Blocked-COO SpMM — Pallas TPU kernel.

``out[d] = sum_e val_e * x[src_e]`` over a graph in the BlockedCoo
layout (graph/blocked.py).  Per grid step (one edge chunk):

    x_tile   <- pipelined DMA, selected by the chunk's src_tile id
    msgs     = onehot(src_local) @ x_tile            # MXU gather
    out_tile += onehot(dst_local)^T @ (msgs * val)   # MXU scatter

Both the gather and scatter are one-hot matmuls against VMEM tiles, so
the kernel runs at MXU speed instead of the scatter-serialised
``segment_sum`` lowering (~30x at the 100k x 100k / 10M-edge scale
config — see BASELINE.md).  The output block is revisited across the
chunks of one dst tile (chunks are dst-tile-sorted) and zeroed on the
first visit.

Backward: SpMM with the transposed graph (A^T @ g), provided by the
pre-built transpose layout in BlockedCooPair; edge values are
non-trainable (they carry degree norms / augmentation masks), so no
cotangent flows to them.

Replaces: DGL C++ ``update_all(copy_u, sum)`` (layers.py:229-232) and
torch cuSPARSE ``th.spmm`` (layers.py:312) for graphs too large for
the dense-mask formulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dream_gnn_tpu.graph.blocked import (BlockedCoo, BlockedCooPair,
                                         EDGE_CHUNK, TILE_DST, TILE_SRC)

INTERPRET = False


def _onehot(ids, n, dtype):
    cols = jax.lax.broadcasted_iota(jnp.int32, (ids.shape[0], n), 1)
    return (ids[:, None] == cols).astype(dtype)


def _spmm_kernel(src_tile_ref, dst_tile_ref, first_ref,
                 src_ref, dst_ref, val_ref, x_ref, out_ref, *, dtype):
    i = pl.program_id(0)

    @pl.when(first_ref[i] == 1)
    def _zero():
        out_ref[:] = jnp.zeros_like(out_ref)

    src = src_ref[:, 0]
    dst = dst_ref[:, 0]
    val = val_ref[:, 0]
    msgs = jnp.dot(_onehot(src, TILE_SRC, dtype), x_ref[:].astype(dtype),
                   preferred_element_type=jnp.float32)
    msgs = msgs * val[:, None]
    out_ref[:] += jnp.dot(_onehot(dst, TILE_DST, dtype).T,
                          msgs.astype(dtype),
                          preferred_element_type=jnp.float32)


def _spmm_blocked_raw(g: BlockedCoo, x: jnp.ndarray,
                      dtype=jnp.bfloat16) -> jnp.ndarray:
    """SpMM over one blocked layout; x (n_src, d) fp32 -> (n_dst, d)."""
    d = x.shape[1]
    x_pad = x if x.shape[0] == g.n_src_pad else jnp.pad(
        x, ((0, g.n_src_pad - x.shape[0]), (0, 0)))

    edge_col = pl.BlockSpec((EDGE_CHUNK, 1), lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_spmm_kernel, dtype=dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,       # src_tile, dst_tile, first
            grid=(g.n_chunks,),
            in_specs=[
                edge_col, edge_col, edge_col,
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
      g.src_local.reshape(-1, 1), g.dst_local.reshape(-1, 1),
      g.val.reshape(-1, 1), x_pad)
    return out[: g.n_dst]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def spmm_blocked(pair: BlockedCooPair, x: jnp.ndarray,
                 dtype=jnp.bfloat16) -> jnp.ndarray:
    """Differentiable blocked SpMM (gradient uses the transpose layout)."""
    return _spmm_blocked_raw(pair.fwd, x, dtype)


def _spmm_fwd(pair, x, dtype):
    return _spmm_blocked_raw(pair.fwd, x, dtype), pair


def _spmm_bwd(dtype, pair, gout):
    import numpy as np

    dx = _spmm_blocked_raw(pair.bwd, gout, dtype)

    def _zero_cot(x):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return jnp.zeros_like(x)
        return np.zeros(x.shape, jax.dtypes.float0)

    # Edge values carry degree norms / augmentation masks, not trainable
    # parameters — zero cotangent for the whole graph structure.
    return (jax.tree.map(_zero_cot, pair), dx)


spmm_blocked.defvjp(_spmm_fwd, _spmm_bwd)

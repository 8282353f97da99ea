"""Blocked-COO layout for the Pallas SpMM kernel.

XLA's ``segment_sum`` SpMM on TPU is scatter-bound: the 100k x 100k /
10M-edge scale config runs at ~6e7 edges/s (scripts/bench_scale.py).
The Pallas kernel (kernels/pallas_spmm.py) instead streams edges in
(dst-tile, src-tile) blocks so both the gather and the scatter become
MXU one-hot matmuls against VMEM-resident tiles, with the tile DMAs
pipelined by the Pallas grid machinery.

Host-side, edges are sorted by (dst_tile, src_tile) and chopped into
fixed-size chunks; each chunk stores tile-local indices plus the two
tile ids (scalar-prefetched so the kernel's BlockSpec index maps select
the right x / out tiles).  Padding chunks carry ``val == 0``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from dream_gnn_tpu.graph.coo import CooGraph

TILE_SRC = 512
TILE_DST = 512
EDGE_CHUNK = 512


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BlockedCoo:
    """Chunked edge list in (dst_tile, src_tile) block order."""

    src_local: jnp.ndarray     # (C, EDGE_CHUNK) int32 in [0, TILE_SRC)
    dst_local: jnp.ndarray     # (C, EDGE_CHUNK) int32 in [0, TILE_DST)
    val: jnp.ndarray           # (C, EDGE_CHUNK) float32, 0 = padding
    src_tile: jnp.ndarray      # (C,) int32 — x tile index per chunk
    dst_tile: jnp.ndarray      # (C,) int32 — out tile index per chunk
    first_of_dst: jnp.ndarray  # (C,) int32 — 1 if first chunk of its
    #                            dst tile (kernel zeroes the block)
    n_src: int = dataclasses.field(metadata=dict(static=True))
    n_dst: int = dataclasses.field(metadata=dict(static=True))

    @property
    def n_chunks(self) -> int:
        return self.src_local.shape[0]

    @property
    def n_src_pad(self) -> int:
        return -(-self.n_src // TILE_SRC) * TILE_SRC

    @property
    def n_dst_pad(self) -> int:
        return -(-self.n_dst // TILE_DST) * TILE_DST


def blocked_from_coo(g: CooGraph) -> BlockedCoo:
    """Build the blocked layout from a (dst-sorted, padded) CooGraph."""
    src = np.asarray(g.src)
    dst = np.asarray(g.dst)
    val = np.asarray(g.val)
    live = val != 0
    src, dst, val = src[live], dst[live], val[live]

    st = src // TILE_SRC
    dt = dst // TILE_DST
    order = np.lexsort((st, dt))
    src, dst, val, st, dt = (src[order], dst[order], val[order],
                             st[order], dt[order])

    # Chunk boundaries: every EDGE_CHUNK edges, plus wherever the
    # (dst_tile, src_tile) block changes.
    block_id = dt.astype(np.int64) * (1 << 32) + st
    new_block = np.concatenate([[True], block_id[1:] != block_id[:-1]])
    block_starts = np.nonzero(new_block)[0]
    starts = []
    for b0, b1 in zip(block_starts,
                      np.concatenate([block_starts[1:], [len(src)]])):
        starts.extend(range(b0, b1, EDGE_CHUNK))
    starts = np.asarray(starts, np.int64)
    ends = np.concatenate([starts[1:], [len(src)]])
    ends = np.minimum(ends, starts + EDGE_CHUNK)

    n_real = len(starts) if len(src) else 0
    # Every dst tile needs at least one chunk: the kernel zeroes an
    # output block on its first visit, and unvisited pallas output
    # blocks are uninitialised memory.
    n_dst_tiles = -(-g.n_dst // TILE_DST)
    present = set(int(t) for t in dt[starts]) if n_real else set()
    missing = sorted(set(range(n_dst_tiles)) - present)

    c = max(n_real + len(missing), 1)
    c_src = np.zeros((c, EDGE_CHUNK), np.int32)
    c_dst = np.zeros((c, EDGE_CHUNK), np.int32)
    c_val = np.zeros((c, EDGE_CHUNK), np.float32)
    c_st = np.zeros((c,), np.int32)
    c_dt = np.zeros((c,), np.int32)
    for i in range(n_real):
        a, b = starts[i], ends[i]
        n = b - a
        c_src[i, :n] = src[a:b] % TILE_SRC
        c_dst[i, :n] = dst[a:b] % TILE_DST
        c_val[i, :n] = val[a:b]
        c_st[i] = st[a]
        c_dt[i] = dt[a]
    for j, tile in enumerate(missing):
        c_dt[n_real + j] = tile

    order = np.lexsort((c_st, c_dt))
    c_src, c_dst, c_val = c_src[order], c_dst[order], c_val[order]
    c_st, c_dt = c_st[order], c_dt[order]
    first = np.concatenate([[1], (c_dt[1:] != c_dt[:-1]).astype(np.int32)])

    return BlockedCoo(
        src_local=jnp.asarray(c_src), dst_local=jnp.asarray(c_dst),
        val=jnp.asarray(c_val), src_tile=jnp.asarray(c_st),
        dst_tile=jnp.asarray(c_dt), first_of_dst=jnp.asarray(first),
        n_src=g.n_src, n_dst=g.n_dst)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BlockedCooPair:
    """Forward layout + transposed layout (for the SpMM backward:
    d/dx (A @ x) pullback is A^T @ g, i.e. SpMM on the reverse graph)."""

    fwd: BlockedCoo
    bwd: BlockedCoo


def blocked_pair_from_coo(g: CooGraph) -> BlockedCooPair:
    gt = CooGraph(src=g.dst, dst=g.src, val=g.val,
                  n_src=g.n_dst, n_dst=g.n_src)
    return BlockedCooPair(fwd=blocked_from_coo(g), bwd=blocked_from_coo(gt))

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
EDGE_CHUNK = 2048     # edges per grid step; large to amortise per-chunk
#                       grid overhead


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


def blocked_from_arrays(src: np.ndarray, dst: np.ndarray, val: np.ndarray,
                        n_src: int, n_dst: int,
                        use_native: bool = True) -> BlockedCoo:
    """Build the blocked layout from host numpy edge arrays.

    Prefer this over ``blocked_from_coo`` when the edges are already on
    host: pulling device arrays back through a relayed TPU is slow.
    Uses the C++ builder (native/blocked_builder.cc, ~20x faster at
    10M edges) when available; the NumPy path below is the reference
    implementation and fallback.
    """
    if use_native:
        from dream_gnn_tpu.graph import native

        out = native.build_blocked_native(src, dst, val, n_src, n_dst,
                                          TILE_SRC, TILE_DST, EDGE_CHUNK)
        if out is not None:
            c_src, c_dst, c_val, c_st, c_dt, c_first = out
            return BlockedCoo(
                src_local=jnp.asarray(c_src), dst_local=jnp.asarray(c_dst),
                val=jnp.asarray(c_val), src_tile=jnp.asarray(c_st),
                dst_tile=jnp.asarray(c_dt),
                first_of_dst=jnp.asarray(c_first),
                n_src=n_src, n_dst=n_dst)

    src = np.asarray(src)
    dst = np.asarray(dst)
    val = np.asarray(val, np.float32)
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

    n_real = len(starts) if len(src) else 0
    # Every dst tile needs at least one chunk: the kernel zeroes an
    # output block on its first visit, and unvisited pallas output
    # blocks are uninitialised memory.
    n_dst_tiles = -(-n_dst // TILE_DST)
    present = set(int(t) for t in dt[starts]) if n_real else set()
    missing = sorted(set(range(n_dst_tiles)) - present)

    c = max(n_real + len(missing), 1)
    c_src = np.zeros((c, EDGE_CHUNK), np.int32)
    c_dst = np.zeros((c, EDGE_CHUNK), np.int32)
    c_val = np.zeros((c, EDGE_CHUNK), np.float32)
    c_st = np.zeros((c,), np.int32)
    c_dt = np.zeros((c,), np.int32)
    if n_real:
        e_idx = np.arange(len(src))
        chunk_of = np.searchsorted(starts, e_idx, side="right") - 1
        pos = e_idx - starts[chunk_of]
        flat = chunk_of * EDGE_CHUNK + pos
        c_src.reshape(-1)[flat] = src % TILE_SRC
        c_dst.reshape(-1)[flat] = dst % TILE_DST
        c_val.reshape(-1)[flat] = val
        c_st[:n_real] = st[starts]
        c_dt[:n_real] = dt[starts]
    c_dt[n_real:n_real + len(missing)] = np.asarray(missing, np.int32)

    order = np.lexsort((c_st, c_dt))
    c_src, c_dst, c_val = c_src[order], c_dst[order], c_val[order]
    c_st, c_dt = c_st[order], c_dt[order]
    first = np.concatenate([[1], (c_dt[1:] != c_dt[:-1]).astype(np.int32)])

    return BlockedCoo(
        src_local=jnp.asarray(c_src), dst_local=jnp.asarray(c_dst),
        val=jnp.asarray(c_val), src_tile=jnp.asarray(c_st),
        dst_tile=jnp.asarray(c_dt), first_of_dst=jnp.asarray(first),
        n_src=n_src, n_dst=n_dst)


def blocked_from_coo(g: CooGraph) -> BlockedCoo:
    """Build from a device CooGraph (single host pull of the arrays)."""
    return blocked_from_arrays(np.asarray(g.src), np.asarray(g.dst),
                               np.asarray(g.val), g.n_src, g.n_dst)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BlockedCooPair:
    """Forward layout + transposed layout (for the SpMM backward:
    d/dx (A @ x) pullback is A^T @ g, i.e. SpMM on the reverse graph)."""

    fwd: BlockedCoo
    bwd: BlockedCoo


def blocked_pair_from_arrays(src, dst, val, n_src: int,
                             n_dst: int) -> BlockedCooPair:
    return BlockedCooPair(
        fwd=blocked_from_arrays(src, dst, val, n_src, n_dst),
        bwd=blocked_from_arrays(dst, src, val, n_dst, n_src))


def blocked_pair_from_coo(g: CooGraph) -> BlockedCooPair:
    return blocked_pair_from_arrays(np.asarray(g.src), np.asarray(g.dst),
                                    np.asarray(g.val), g.n_src, g.n_dst)

"""Sequential-slab scatter-add — Pallas TPU kernel (decoder backward).

``out[n] = sum_{k : node_of_slot[k] == n} val_k * x[k]`` for a slot
stream SORTED by node — the structure of the scale decoder's table
gradients (kernels/pallas_scale_decoder.py: da1 is emitted in
drug-/dis-sorted slot order, so each 512-row node tile's
contributions are ONE consecutive slab of da1).

Round-5 phase probe (scripts/probe_scale_decoder_phases.py): the
grouped-gather SpMM used for this scatter costs 4.11 / 3.28 ms per
table — and a separate measurement showed the (1M, 128) -> packed
transposed relayout of da1 that path performs in XLA costs 4.11 ms
ALONE (the gather kernel itself hides under it).  The relayout exists
only because the gather kernel's sub-vreg shuffles need
feature-major packed panels.  A node-sorted stream needs NO gather at
all:

    per batch b (2048 consecutive slots of one dst tile):
        DMA  da1[b_start : b_start + 2048]      (edge-major, as-is)
        mask = (row_iota == dst_rel)            (tile x 2048 one-hot)
        out[tile] += mask @ slab                (MXU)

Batches never split a tile: each tile's batches start at the tile's
first slot and step 2048, the last one overlapping into foreign slots
that the mask (dst_rel = -1) zeroes — ~20% duplicate streaming at 1M
candidates, far cheaper than the relayout it replaces.  Total traffic
is one sequential read of da1 (f32, no packing) + the out table.

Not differentiable — it IS a backward-pass primitive.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = False

SEQ_BATCH = 2048          # slots per batch (one scatter matmul)
SEQ_TILE = 512            # dst rows per out tile


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SeqScatter:
    dst_rel: jnp.ndarray   # (B * SEQ_BATCH,) int32: node -
    #                        tile*SEQ_TILE, -1 for slots outside the
    #                        batch's tile (padding slots, overlap into
    #                        other tiles).  Flat: a (B, SEQ_BATCH)
    #                        2-D block of height 1 violates Mosaic's
    #                        (8, 128) block-divisibility rule; 1-D
    #                        blocks only need lane divisibility.
    val: jnp.ndarray       # (B * SEQ_BATCH,) float32 edge weights
    b_start: jnp.ndarray   # (B,) int32 slot offset into x (clamped so
    #                        start + SEQ_BATCH <= n_src_pad)
    b_tile: jnp.ndarray    # (B,) int32 dst tile id (nondecreasing)
    b_first: jnp.ndarray   # (B,) int32: 1 on each tile's first batch
    n_src_pad: int = dataclasses.field(metadata=dict(static=True))
    n_dst: int = dataclasses.field(metadata=dict(static=True))

    @property
    def n_batches(self) -> int:
        return self.dst_rel.shape[0] // SEQ_BATCH

    @property
    def n_dst_pad(self) -> int:
        return -(-self.n_dst // SEQ_TILE) * SEQ_TILE


def build_seq_scatter(node_of_slot, live, val, n_dst: int) -> SeqScatter:
    """Layout for a node-sorted slot stream.

    ``node_of_slot``: (n_slots,) node id per slot (ascending over live
    slots); ``live``: bool mask (padding slots False — their position
    still occupies the stream); ``val``: per-slot weight.
    """
    node_of_slot = np.asarray(node_of_slot, np.int64)
    live = np.asarray(live, bool)
    val = np.asarray(val, np.float32)
    n = node_of_slot.shape[0]
    n_src_pad = max(-(-n // SEQ_BATCH) * SEQ_BATCH, SEQ_BATCH)

    # Forward-fill node over padding slots so per-tile ranges are
    # computable on a monotone array (dst_rel still masks pads out).
    filled = node_of_slot.copy()
    if not live.all():
        idx = np.where(live, np.arange(n), -1)
        np.maximum.accumulate(idx, out=idx)
        filled = np.where(idx >= 0, node_of_slot[np.maximum(idx, 0)], 0)

    n_tiles = -(-n_dst // SEQ_TILE)
    starts, tiles, firsts = [], [], []
    bounds = np.searchsorted(filled, np.arange(n_tiles + 1) * SEQ_TILE)
    for t in range(n_tiles):
        lo, hi = int(bounds[t]), int(bounds[t + 1])
        if lo >= hi:
            # Empty tile: one stub batch zeroes its out block.
            starts.append((0, 0))
            tiles.append(t)
            firsts.append(1)
            continue
        first = 1
        for s in range(lo, hi, SEQ_BATCH):
            # Clamp the DMA window to the padded stream, but remember
            # the logical start: a clamped window slides BACK over
            # slots the previous batch already scattered, and those
            # must be masked out of this batch or they double-count.
            starts.append((min(s, n_src_pad - SEQ_BATCH), s))
            tiles.append(t)
            firsts.append(first)
            first = 0
    b = len(starts)
    orig = np.asarray([s for _, s in starts], np.int64)
    starts = np.asarray([c for c, _ in starts], np.int32)
    dst_rel = np.full((b, SEQ_BATCH), -1, np.int32)
    vals = np.zeros((b, SEQ_BATCH), np.float32)
    node_pad = np.full((n_src_pad,), -1, np.int64)
    node_pad[:n] = np.where(live, node_of_slot, -1)
    val_pad = np.zeros((n_src_pad,), np.float32)
    val_pad[:n] = np.where(live, val, 0.0)
    for i, (s, t) in enumerate(zip(starts, tiles)):
        # Stub batches for empty tiles need no special case: no node
        # in the window falls inside tile t, so dst_rel stays -1.
        win = node_pad[s:s + SEQ_BATCH]
        inside = ((win >= t * SEQ_TILE) & (win < (t + 1) * SEQ_TILE)
                  & (np.arange(s, s + SEQ_BATCH) >= orig[i]))
        dst_rel[i] = np.where(inside, win - t * SEQ_TILE, -1)
        vals[i] = np.where(inside, val_pad[s:s + SEQ_BATCH], 0.0)
    return SeqScatter(
        dst_rel=jnp.asarray(dst_rel.reshape(-1)),
        val=jnp.asarray(vals.reshape(-1)),
        b_start=jnp.asarray(starts),
        b_tile=jnp.asarray(np.asarray(tiles, np.int32)),
        b_first=jnp.asarray(np.asarray(firsts, np.int32)),
        n_src_pad=int(n_src_pad), n_dst=int(n_dst))


def _seq_scatter_kernel(start_ref, tile_ref, first_ref, rel_ref,
                        val_ref, x_hbm, out_ref, slab, sems, rows_sc,
                        *, dtype):
    i = pl.program_id(0)
    nb = pl.num_programs(0)

    def slab_dma(sl, s):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(s, SEQ_BATCH)], slab.at[sl], sems.at[sl])

    @pl.when(i == 0)
    def _init():
        rows_sc[0] = jax.lax.broadcasted_iota(
            jnp.int32, rows_sc.shape[1:], 0)
        slab_dma(0, start_ref[0]).start()

    @pl.when(i + 1 < nb)
    def _issue_next():
        slab_dma((i + 1) & 1, start_ref[i + 1]).start()

    slab_dma(i & 1, 0).wait()

    @pl.when(first_ref[i] == 1)
    def _zero():
        out_ref[...] = jnp.zeros_like(out_ref)

    x = slab[i & 1].astype(dtype)                    # (SEQ_BATCH, d)
    rel = rel_ref[...]                               # (SEQ_BATCH,)
    eq = rows_sc[0] == jnp.broadcast_to(rel[None, :],
                                        (SEQ_TILE, SEQ_BATCH))
    if jnp.dtype(dtype) == jnp.float32:
        m = jnp.where(eq, jnp.broadcast_to(val_ref[...][None, :],
                                           (SEQ_TILE, SEQ_BATCH)),
                      jnp.zeros((), dtype))
    else:
        m = eq.astype(dtype)
        x = x * val_ref[...][:, None].astype(dtype)
    out_ref[...] += jax.lax.dot_general(
        m, x, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def seq_scatter(g: SeqScatter, x: jnp.ndarray,
                dtype=jnp.bfloat16) -> jnp.ndarray:
    """(n_dst, d) scatter-add of the node-sorted slot stream ``x``
    ((n_slots, d); padded to g.n_src_pad internally)."""
    d = x.shape[1]
    if x.shape[0] != g.n_src_pad:
        x = jnp.pad(x, ((0, g.n_src_pad - x.shape[0]), (0, 0)))
    x = x.astype(jnp.float32)
    out = pl.pallas_call(
        functools.partial(_seq_scatter_kernel, dtype=dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,       # b_start, b_tile, b_first
            grid=(g.n_batches,),
            in_specs=[
                pl.BlockSpec((SEQ_BATCH,), lambda i, *_: (i,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((SEQ_BATCH,), lambda i, *_: (i,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),       # x in HBM
            ],
            out_specs=pl.BlockSpec(
                (SEQ_TILE, d),
                lambda i, start, tile, first: (tile[i], 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, SEQ_BATCH, d), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.VMEM((1, SEQ_TILE, SEQ_BATCH), jnp.int32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((g.n_dst_pad, d), jnp.float32),
        interpret=INTERPRET,
    )(g.b_start, g.b_tile, g.b_first, g.dst_rel, g.val, x)
    return out[: g.n_dst]

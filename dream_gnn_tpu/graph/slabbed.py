"""Slab-streamed COO layout for the v3 gather SpMM kernel.

Round-4 measurement (docs/kernels.md §4, scripts/probe_spmm_overlap.py)
pinned the grouped-gather kernel's binding term: ~0.15 us of fixed
per-group cost x 85k groups — scalar meta decode, the per-group DMA
boundary ``pl.when``, and panel-ring bookkeeping — NOT the gather
dataflow itself (adding a whole window step measured ~3.6 ns/group,
so the VPU retires several ops/cycle through the select tree).  The
verdict's called-for re-architecture is therefore about deleting the
per-group machinery, not about scheduling:

- **Dst-slab outer loop.**  The dst axis splits into SLABS of
  ``k`` tiles; one slab's output (k, d, tile) stays VMEM-resident (the
  Pallas out block) while ALL of x streams past it once.  Total panel
  traffic collapses from n_dst_tiles passes over x (5.0 GB at the 10M
  config) to n_slabs passes (~0.6 GB) — and, decoupled from DMA,
  ``tile`` can drop to 256, halving the scatter matmul's MAC floor
  (the one term that was AT its roofline).
- **Chunk-aligned panel transitions.**  Src superblocks are big
  (``span``=128 sub-tiles, 4 MB packed) and blocks pad to whole
  chunks, so a panel transition only ever happens at a chunk start:
  ~100 transitions total instead of ~38k, handled by ONE ``pl.when``
  per chunk.  Per-slot schedule is a single packed int (ring slot |
  p0) — no per-group branches, no per-group transition decode.
- **Slot geometry unchanged** where it was already right: <=128-edge
  slots whose sources span <= ``window`` consecutive 128-row sub-tiles
  (one hardware ``dynamic_gather`` per window sub-tile, select-tree
  merged), destinations inside one ``tile``-row dst tile, scatter via
  a one-hot MXU matmul per chunk.

Stream order: slab -> superblock -> dst tile (within slab) -> slots.
Every (superblock, dst-tile) BLOCK's slots pad to a multiple of
``cs`` (slots per chunk) so chunks never straddle a block; a chunk is
one scatter batch (all edges share the dst tile, all sources sit in
the resident panel).

Replaces DGL's C++ ``update_all(copy_u, sum)`` SpMM
(/root/reference/layers.py:229-232) at scales the reference never
reaches; supersedes graph/grouped.py as the single-device scale path
(the grouped layout remains for the edge-partitioned / ring SPMD
paths, whose per-shard sub-blocks are too small to amortise slabs).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

SUB = 128                 # src rows per hardware gather (one vreg of lanes)
NSLOTS_V3 = 2             # resident panel ring depth (pow2)
LEAD_V3 = 1               # panel DMA issued LEAD transitions ahead
TILE_V3 = 256             # default dst rows per scatter tile
SPAN_V3 = 128             # default src sub-tiles per panel (16384 rows)
CS_V3 = 8                 # slots per chunk (= scatter batch width / 128)
SLAB_TILES_V3 = 16        # dst tiles per resident slab


VMEM_BUDGET_V3 = 13 * 2 ** 20   # kernel scoped-VMEM target (chip limit
#                                 is 16 MiB; leave head-room for edge
#                                 stream double-buffers + compiler)


def auto_geometry(n_live: int, n_src: int, n_dst: int, d: int = 128,
                  cs: int = CS_V3):
    """Density-adaptive (tile, span, window, k) for a slabbed layout.

    A 128-edge slot spans ~128 / (density*SUB*tile) consecutive src
    sub-tiles, so sparser graphs need wider windows or taller tiles.
    Prefer the smallest tile (scatter MACs are proportional to tile)
    whose window stays <= 8 — beyond that the select tree's VPU cost
    and slot-cut losses outgrow the MAC savings.  Window is the
    tightest cover of one slot's expected span: the chip sweep
    (scripts/probe_spmm_slab.py) measured ~10 ns per window step per
    slot while occupancy at the 10M config was FLAT from w=4 to w=6
    (cs-padding, not window cuts, bounds it).

    ``k`` (slab tiles) and ``span`` then fit the scoped-VMEM budget —
    the v5e limit is 16 MiB and the kernel's residents are the 2-deep
    panel ring (2 * span * SUB * d/2 * 4B), the DOUBLE-BUFFERED out
    block (2 * k * d * tile * 4B) and the row-id plane
    (tile * cs * SUB * 4B); a tile=512 relation at span=128/k=16
    measured 18.02 MiB and was rejected by the Mosaic allocator.
    Slab width k*tile stays ~4096 rows (panel-traffic passes over x
    are n_dst / (k*tile) — constant across tile choices).
    """
    density = n_live / max(float(n_src) * float(n_dst), 1.0)
    for tile in (256, 512, 1024):
        exp_per_subtile = density * SUB * tile
        window = int(np.ceil(SUB / max(exp_per_subtile, 1e-12)))
        if window <= 8:
            break
    window = int(np.clip(window, 3, 8))
    k = max(4096 // tile, 1)
    rows_bytes = tile * cs * SUB * 4
    out_bytes = 2 * k * d * tile * 4
    span = SPAN_V3
    while span > 8 and (2 * span * SUB * (d // 2) * 4
                        + out_bytes + rows_bytes) > VMEM_BUDGET_V3:
        span //= 2
    return tile, span, window, k


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SlabbedCoo:
    src_local: jnp.ndarray   # (C, cs, 128) int32 in [0, span * SUB)
    dst_local: jnp.ndarray   # (C, cs, 128) int32 in [0, tile)
    val: jnp.ndarray         # (C, cs, 128) float32, 0 = padding
    edge_id: jnp.ndarray     # (C, cs, 128) int32 physical edge index
    #                          (padding slots get n_live) — shared
    #                          between a pair's fwd/bwd layouts so
    #                          per-edge PRF masks stay consistent.
    slot_meta: jnp.ndarray   # (C * cs,) int32: (ring_slot << 8) | p0
    #                          (flat: >2048-row 2-D SMEM refs crash the
    #                          Mosaic backend; see kernels/pallas_spmm_slab)
    c_dt: jnp.ndarray        # (C,) int32 — dst tile index WITHIN slab
    c_slab: jnp.ndarray      # (C,) int32 — slab id (out block index)
    c_first: jnp.ndarray     # (C,) int32 — 1 on each slab's first chunk
    c_live: jnp.ndarray      # (C,) int32 — 0 only on empty-slab stubs
    c_wait: jnp.ndarray      # (C,) int32 — transition id whose panel
    #                          this chunk must wait for, else -1
    trans_sb: jnp.ndarray    # (T + LEAD,) int32 superblock per
    #                          transition, -1 beyond the last
    n_src: int = dataclasses.field(metadata=dict(static=True))
    n_dst: int = dataclasses.field(metadata=dict(static=True))
    tile: int = dataclasses.field(metadata=dict(static=True))
    span: int = dataclasses.field(metadata=dict(static=True))
    window: int = dataclasses.field(metadata=dict(static=True))
    k: int = dataclasses.field(metadata=dict(static=True))
    n_live: int = dataclasses.field(metadata=dict(static=True))

    @property
    def cs(self) -> int:
        return self.src_local.shape[1]

    @property
    def n_chunks(self) -> int:
        return self.src_local.shape[0]

    @property
    def n_sb(self) -> int:
        blk = self.span * SUB
        return -(-self.n_src // blk)

    @property
    def n_src_pad(self) -> int:
        return self.n_sb * self.span * SUB

    @property
    def n_slabs(self) -> int:
        return -(-(-(-self.n_dst // self.tile)) // self.k)

    @property
    def n_tiles_pad(self) -> int:
        return self.n_slabs * self.k

    @property
    def n_dst_pad(self) -> int:
        return self.n_tiles_pad * self.tile

    @property
    def occupancy(self) -> float:
        return self.n_live / max(self.val.size, 1)


def slabbed_from_arrays(src, dst, val, n_src: int, n_dst: int,
                        tile: int | None = None,
                        span: int | None = None,
                        window: int | None = None,
                        cs: int = CS_V3,
                        k: int | None = None,
                        d: int = 128) -> SlabbedCoo:
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    val = np.asarray(val, np.float32)
    live = val != 0
    src, dst, val = src[live], dst[live], val[live]
    phys = np.arange(len(src), dtype=np.int64)

    a_tile, a_span, a_window, a_k = auto_geometry(len(src), n_src,
                                                  n_dst, d=d, cs=cs)
    tile = a_tile if tile is None else tile
    span = a_span if span is None else span
    window = a_window if window is None else window
    k = a_k if k is None else k
    window = min(window, span)
    if span > 128:
        raise ValueError("span > 128 overflows the 8-bit packed p0")

    st = src // SUB                       # global src sub-tile
    sb = st // span                       # superblock (panel) id
    dt = dst // tile                      # global dst tile
    slab = dt // k
    order = np.lexsort((st, dt, sb, slab))
    src, dst, val, st, sb, dt, slab, phys = (
        src[order], dst[order], val[order], st[order], sb[order],
        dt[order], slab[order], phys[order])
    n = len(src)

    # Block starts: (slab, sb, dt) changes.
    key = (slab * (1 << 40)) + (sb * (1 << 20)) + dt
    new_block = np.concatenate([[True], key[1:] != key[:-1]]) \
        if n else np.zeros((0,), bool)
    block_starts = np.nonzero(new_block)[0]
    block_bounds = list(zip(block_starts,
                            np.concatenate([block_starts[1:], [n]])))

    # Cut each block into <=128-edge window-capped slots, then pad the
    # block's slot count to a multiple of cs (chunks never straddle).
    n_slabs = max(-(-(-(-n_dst // tile)) // k), 1)
    chunks = []          # (slab, sb_or_-1, dt_local, [(a, b) slots])
    for b0, b1 in block_bounds:
        sts = st[b0:b1]
        slots = []
        i = b0
        while i < b1:
            j = min(i + SUB, b1)
            jw = b0 + np.searchsorted(sts, st[i] + window, side="left")
            slots.append((i, min(j, int(jw))))
            i = slots[-1][1]
        while len(slots) % cs:
            slots.append((b1, b1))       # padding slot
        s, b, t = int(slab[b0]), int(sb[b0]), int(dt[b0] % k)
        for off in range(0, len(slots), cs):
            chunks.append((s, b, t, slots[off:off + cs]))

    # Empty slabs still need one stub chunk so their out block gets
    # zeroed (Pallas only writes blocks the index map visits).
    covered = {c[0] for c in chunks}
    for s in range(n_slabs):
        if s not in covered:
            chunks.append((s, -1, 0, [(0, 0)] * cs))
    chunks.sort(key=lambda c: (c[0], c[1], c[2]))

    c = len(chunks)
    g_src = np.zeros((c, cs, SUB), np.int32)
    g_dst = np.zeros((c, cs, SUB), np.int32)
    g_val = np.zeros((c, cs, SUB), np.float32)
    g_eid = np.full((c, cs, SUB), n, np.int32)
    meta = np.zeros((c, cs), np.int32)
    c_dt = np.zeros((c,), np.int32)
    c_slab = np.zeros((c,), np.int32)
    c_first = np.zeros((c,), np.int32)
    c_live = np.zeros((c,), np.int32)
    c_wait = np.full((c,), -1, np.int32)
    trans_sb = []

    span_sub = span * SUB
    prev_panel = None     # (slab, sb) of the panel the stream holds
    prev_slab = None
    for ci, (s, b, t, slots) in enumerate(chunks):
        c_dt[ci] = t
        c_slab[ci] = s
        if s != prev_slab:
            c_first[ci] = 1
            prev_slab = s
        if b < 0:
            continue                       # empty-slab stub
        c_live[ci] = 1
        if (s, b) != prev_panel:
            trans_sb.append(b)
            c_wait[ci] = len(trans_sb) - 1
            prev_panel = (s, b)
        sl = (len(trans_sb) - 1) & (NSLOTS_V3 - 1)
        for gj, (a, e) in enumerate(slots):
            m = e - a
            p0 = 0
            if m:
                g_src[ci, gj, :m] = src[a:e] % span_sub
                g_dst[ci, gj, :m] = dst[a:e] % tile
                g_val[ci, gj, :m] = val[a:e]
                g_eid[ci, gj, :m] = phys[a:e]
                p0 = min(int(st[a] - b * span), span - window)
            # Padding slots inherit the section's ring slot (their
            # panel is resident and finite; val=0 nullifies).
            meta[ci, gj] = (sl << 8) | p0

    trans_arr = np.concatenate([
        np.asarray(trans_sb, np.int32) if trans_sb
        else np.zeros((0,), np.int32),
        np.full((LEAD_V3,), -1, np.int32)])

    return SlabbedCoo(
        src_local=jnp.asarray(g_src), dst_local=jnp.asarray(g_dst),
        val=jnp.asarray(g_val), edge_id=jnp.asarray(g_eid),
        slot_meta=jnp.asarray(meta.reshape(-1)), c_dt=jnp.asarray(c_dt),
        c_slab=jnp.asarray(c_slab), c_first=jnp.asarray(c_first),
        c_live=jnp.asarray(c_live), c_wait=jnp.asarray(c_wait),
        trans_sb=jnp.asarray(trans_arr), n_src=n_src, n_dst=n_dst,
        tile=tile, span=span, window=window, k=k, n_live=int(n))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SlabbedCooPair:
    fwd: SlabbedCoo
    bwd: SlabbedCoo


def slabbed_pair_from_arrays(src, dst, val, n_src: int, n_dst: int,
                             tile: int | None = None,
                             span: int | None = None,
                             window: int | None = None,
                             d: int = 128) -> SlabbedCooPair:
    return SlabbedCooPair(
        fwd=slabbed_from_arrays(src, dst, val, n_src, n_dst, tile=tile,
                                span=span, window=window, d=d),
        bwd=slabbed_from_arrays(dst, src, val, n_dst, n_src, tile=tile,
                                span=span, window=window, d=d))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BipartiteSlabbed:
    """Relation-typed bipartite encoder graph, slab-streamed layout.

    The v3 single-device scale counterpart of
    graph/grouped.BipartiteGrouped: each (rating, direction) relation
    is a SlabbedCooPair consumed by kernels/pallas_spmm_slab, with
    per-relation density-adaptive (tile, window) geometry.  Mirrors
    the COO layout's norm semantics (degree summed over relations).
    """

    fwd: tuple        # tuple[SlabbedCooPair], len R (drug -> disease)
    rev: tuple        # tuple[SlabbedCooPair], len R (disease -> drug)
    ci_drug: jnp.ndarray
    cj_drug: jnp.ndarray
    ci_dis: jnp.ndarray
    cj_dis: jnp.ndarray

    @property
    def num_ratings(self) -> int:
        return len(self.fwd)


def build_enc_graph_slabbed(pairs, values, n_drug: int, n_dis: int,
                            symm: bool = True,
                            ratings=(0, 1),
                            d: int = 128) -> BipartiteSlabbed:
    """``d``: the feature width the kernels will stream (the model's
    effective message units — 128 for the scale config's layer shapes:
    gcn_agg_units=384 // 3 for layer 0, gcn_out_units for the rest).
    auto_geometry budgets the scoped-VMEM residents for this width;
    the kernel re-checks at call time and raises a clear error on a
    mismatch that would overflow the 16 MiB limit."""
    pairs = np.asarray(pairs)
    values = np.asarray(values)
    fwd, rev = [], []
    for r in ratings:
        idx = np.where(values == r)[0]
        dr, di = pairs[0][idx], pairs[1][idx]
        ones = np.ones(len(idx), np.float32)
        fwd.append(slabbed_pair_from_arrays(dr, di, ones, n_drug,
                                            n_dis, d=d))
        rev.append(slabbed_pair_from_arrays(di, dr, ones, n_dis,
                                            n_drug, d=d))

    from dream_gnn_tpu.graph.norms import inv_sqrt_norm

    deg_drug = np.bincount(pairs[0], minlength=n_drug).astype(np.float32)
    deg_dis = np.bincount(pairs[1], minlength=n_dis).astype(np.float32)
    ci_drug = jnp.asarray(inv_sqrt_norm(deg_drug))
    ci_dis = jnp.asarray(inv_sqrt_norm(deg_dis))
    cj_drug = ci_drug if symm else jnp.ones((n_drug, 1), jnp.float32)
    cj_dis = ci_dis if symm else jnp.ones((n_dis, 1), jnp.float32)
    return BipartiteSlabbed(fwd=tuple(fwd), rev=tuple(rev),
                            ci_drug=ci_drug, cj_drug=cj_drug,
                            ci_dis=ci_dis, cj_dis=cj_dis)

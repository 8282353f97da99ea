"""Grouped-COO layout for the sub-vreg gather SpMM kernel.

Mosaic's ``tpu.dynamic_gather`` shuffles within a single vreg, so one
hardware gather addresses at most 128 lanes (``SUB``).  Edges are
therefore organised into GROUPS of <= 128 edges whose sources all fall
in a WINDOW of ``window`` consecutive 128-row src sub-tiles inside one
SUPERBLOCK of ``span`` sub-tiles (and whose destinations fall in one
512-row dst tile).  The kernel (kernels/pallas_spmm_gather.py) gathers
each group with exactly ``window`` hardware shuffles (one per window
sub-tile, starting at the group's base sub-tile ``p0``) merged by a
select tree.

Two independent levers, decoupled on purpose:

- ``span`` sizes the PANEL — the superblock slab DMA'd from HBM into
  the VMEM ring.  Large spans amortise the per-(dst_tile, superblock)
  panel fetch (total panel bytes = n_dst_tiles * n_src * d * bytes,
  independent of span, but FEWER, larger DMAs pipeline better) and
  raise slot occupancy: with span=16 a uniform-random 10M-edge graph
  fills 128-edge slots to ~93% vs ~51% at span=1.  Padding slots
  multiply the scatter matmul's MACs (TILE_DST * d per slot), so
  occupancy is the scatter cost's denominator.
- ``window`` caps the GATHER work per group.  Edges are sorted by
  (dst_tile, src_subtile), so a group's touched sub-tiles are a
  consecutive range; cutting groups whenever that range would exceed
  ``window`` keeps the per-group shuffle count at ``window`` instead
  of ``span``.  At 10M random edges a 128-edge run almost never spans
  more than 3 sub-tiles (measured: window=3 costs +0.7% groups vs
  unbounded at span=16), so span=16/window=3 gets span-16 occupancy
  with 3 shuffles per group where the round-2 kernel paid span(=8)
  shuffles — the dominant VPU cost of the kernel.

Superblock panels are DMA'd into a ring of ``NSLOTS`` resident VMEM
slots on a host-precomputed schedule compressed to fit SMEM (~1 MB):
per group slot one packed int32
``(trans_id << (p0_bits + window)) | (p0 << window) | touch_mask``
(PAD_META for padding groups), where ``p0`` is the group's base
sub-tile within the superblock (clamped to ``span - window`` so the
window never leaves the panel) and ``touch_mask`` flags the touched
window sub-tiles (all zero => padding; used for batch skip).  Plus one
superblock id per panel TRANSITION.  The kernel derives everything
else: ring slot = ``trans_id % NSLOTS``, a wait fires at each trans_id
change (and issues the DMA for transition ``trans_id + LEAD`` so
copies ride ``LEAD`` transitions ahead of their consumer).  Per-group
schedule cost is 4 bytes — an uncompressed schedule (wait/slot/touch/
start channels per group) blew the 1 MB SMEM budget at 10M edges.

Hierarchy: chunk = GROUPS_PER_CHUNK groups sharing a dst tile; groups
are runs of (dst_tile, src_subtile)-sorted edges cut at superblock
boundaries, window overflows, and 128 edges.  Padding groups carry
``val == 0`` and ``touch == 0`` (the kernel skips a whole group batch
of padding's scatter matmul).

Replaces DGL's C++ ``update_all(copy_u, sum)`` SpMM
(/root/reference/layers.py:229-232) at scales the reference never
reaches.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

SUB = 128                 # src rows per hardware gather (one vreg of lanes)
TILE_DST_G = 512          # dst rows per output block
GROUPS_PER_CHUNK = 16
SPAN = 16                 # src sub-tiles per superblock panel
WINDOW = 3                # consecutive sub-tiles addressable per group
NSLOTS = 4                # resident superblock panels (VMEM ring, pow2)
LEAD = 2                  # panel DMA issued LEAD transitions ahead
PAD_META = np.int32(np.iinfo(np.int32).min)   # g_meta of padding groups
#   touch bits all 0 (batch-skip detects padding); p0 bits decode to 0;
#   trans_id bits arithmetic-shift to a negative id no live group
#   carries, so the group after a padding run always re-waits its (new)
#   transition.


def p0_bits_for(span: int) -> int:
    """Bits used for the base-sub-tile field of the packed meta."""
    return (span - 1).bit_length()


def auto_gpc(n_live: int, n_dst: int, tile_dst: int = TILE_DST_G) -> int:
    """Groups-per-chunk for a layout's size (VERDICT r4 #3).

    Chunk-slot padding — each dst tile's group list padding to a
    GROUPS_PER_CHUNK multiple — is what collapses occupancy on SMALL
    layouts: a ring sub-block at S=16 (39k edges, 13 dst tiles,
    ~23.5 live slots per tile) pads 23.5 -> 32 under gpc=16
    (occ 0.73, +25% scatter MACs); gpc=8 pads to 24 (occ ~0.92).
    Full-scale layouts (hundreds of slots per tile) keep 16 — the
    measured scatter-batch optimum (docs/kernels.md §4).  The kernel
    reads gpc from the layout shape, so mixed-gpc layouts coexist.
    """
    n_tiles = max(-(-n_dst // tile_dst), 1)
    est_slots_per_tile = n_live / n_tiles / (SUB * 0.9)
    # Keep expected chunk padding under ~8% of the tile's slots
    # (pad ~ gpc/2 per tile): measured at the S=16 ring sub-block
    # (est ~26 slots/tile), gpc=8 still lost 25% to padding while
    # gpc=4 landed occ 0.857 with identical kernel output.
    if est_slots_per_tile >= 96:
        return 16
    if est_slots_per_tile >= 48:
        return 8
    if est_slots_per_tile >= 12:
        return 4
    return 2


def auto_span_window(n_live: int, n_src: int, n_dst: int,
                     tile_dst: int = TILE_DST_G):
    """Density-adaptive (span, window) for a layout.

    Slot occupancy is set by the expected edge count of a
    (tile_dst x window*SUB) region: sparse graphs need wider windows
    to fill 128-edge slots (at the 10M-edge scale config's rating-1
    relation — 3M edges over 100k x 100k — the fixed window=3 default
    filled slots to only 0.39, wasting 2.5x scatter MACs + mask
    traffic; window=8/span=32 restores 0.92).  Pick the smallest
    window whose expected region population is ~1.4 slots, then a
    span >= 4*window so superblock-boundary cuts stay rare.  Dense
    graphs keep the measured 10M-edge optimum (window 3, span 16);
    span caps at 32 (NSLOTS panel ring VMEM) and window at 12 (VPU
    shuffle cost grows linearly with window).
    """
    density = n_live / max(float(n_src) * float(n_dst), 1.0)
    exp_per_subtile = density * tile_dst * SUB
    # Cap at 8: past that, GROUPS_PER_CHUNK chunk-slot padding (not
    # window cuts) bounds occupancy (~0.85 measured at 3M/100k^2), so
    # wider windows only add shuffles.
    window = int(np.clip(np.ceil(180.0 / max(exp_per_subtile, 1e-12)),
                         3, 8))
    span = 16 if window <= 4 else 32
    return span, window


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GroupedCoo:
    src_local: jnp.ndarray    # (C, G, 128) int32 in [0, span * SUB)
    dst_local: jnp.ndarray    # (C, G, 128) int32 in [0, TILE_DST_G)
    val: jnp.ndarray          # (C, G, 128) float32, 0 = padding
    g_meta: jnp.ndarray       # (C * G,) int32 — packed
    #                           (trans_id << (p0_bits + window)) |
    #                           (p0 << window) | touch; PAD_META for
    #                           padding groups
    trans_sb: jnp.ndarray     # (T + LEAD,) int32 — superblock id per
    #                           panel transition, -1 beyond the last
    dst_tile: jnp.ndarray     # (C,) int32
    first_of_dst: jnp.ndarray  # (C,) int32
    edge_id: jnp.ndarray      # (C, G, 128) int32 — physical edge index
    #                           (order of the live input edges; padding
    #                           slots get n_edges).  The fwd and bwd
    #                           layouts of a pair share this indexing,
    #                           so per-edge masks (augmentation) can be
    #                           applied consistently to both.
    n_src: int = dataclasses.field(metadata=dict(static=True))
    n_dst: int = dataclasses.field(metadata=dict(static=True))
    span: int = dataclasses.field(default=SPAN, metadata=dict(static=True))
    window: int = dataclasses.field(default=WINDOW,
                                    metadata=dict(static=True))
    n_live: int = dataclasses.field(default=0, metadata=dict(static=True))
    # Dst rows per output tile.  Default is the SpMM kernel's 512; the
    # scale decoder layout uses fatter tiles (its panel-stream traffic
    # is n_dst_tiles * n_src * bytes, so fewer, larger dst tiles cut
    # DMA where the one-hot MXU cost can absorb it).
    tile_dst: int = dataclasses.field(default=TILE_DST_G,
                                      metadata=dict(static=True))

    @property
    def n_chunks(self) -> int:
        return self.src_local.shape[0]

    @property
    def n_src_pad(self) -> int:
        blk = self.span * SUB
        return -(-self.n_src // blk) * blk

    @property
    def n_dst_pad(self) -> int:
        return -(-self.n_dst // self.tile_dst) * self.tile_dst

    @property
    def occupancy(self) -> float:
        """Live-edge fraction of the layout's 128-edge slots.

        Computed from the static live count captured at build time —
        never reads ``val`` back from the device (the layout usually
        lives in TPU HBM; a D2H readback here would stall the host).
        """
        return self.n_live / max(self.val.size, 1)


def grouped_from_arrays(src, dst, val, n_src: int, n_dst: int,
                        span: int | None = None,
                        window: int | None = None,
                        use_native: bool = True,
                        tile_dst: int = TILE_DST_G,
                        gpc: int | None = None) -> GroupedCoo:
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    val = np.asarray(val, np.float32)
    if span is None or window is None:
        a_span, a_window = auto_span_window(
            int((val != 0).sum()), n_src, n_dst, tile_dst)
        span = a_span if span is None else span
        window = a_window if window is None else window
    window = min(window, span)
    # gpc defaults to the module constant (NOT auto_gpc): the scale
    # decoder's stream kernels bake GROUPS_PER_CHUNK into their grid
    # maths — small-layout callers (ring sub-blocks) opt in explicitly.
    gpc = GROUPS_PER_CHUNK if gpc is None else gpc
    p0b = p0_bits_for(span)
    shift = p0b + window

    # Native C++ builder (one std::sort + linear fill; ~16x the NumPy
    # path at 10M edges).  Output contract is bit-identical — pinned by
    # tests/test_native_builder.py.
    from dream_gnn_tpu.graph import native as _native
    built = _native.build_grouped_native(src, dst, val, n_src, n_dst,
                                         SUB, tile_dst,
                                         gpc, span, window,
                                         LEAD) \
        if use_native else None
    if built is not None:
        (g_src, g_dst, g_val, g_eid, g_meta, trans_sb,
         c_dt, c_first, n_live) = built
        return GroupedCoo(
            src_local=jnp.asarray(g_src), dst_local=jnp.asarray(g_dst),
            val=jnp.asarray(g_val), g_meta=jnp.asarray(g_meta),
            trans_sb=jnp.asarray(trans_sb),
            dst_tile=jnp.asarray(c_dt), first_of_dst=jnp.asarray(c_first),
            edge_id=jnp.asarray(g_eid), n_src=n_src, n_dst=n_dst,
            span=span, window=window, n_live=int(n_live),
            tile_dst=tile_dst)
    live = val != 0
    src, dst, val = src[live], dst[live], val[live]
    phys = np.arange(len(src), dtype=np.int64)   # live-edge indexing

    st = src // SUB
    dt = dst // tile_dst
    sb = st // span
    order = np.lexsort((st, dt))
    src, dst, val, st, dt, sb, phys = (src[order], dst[order], val[order],
                                       st[order], dt[order], sb[order],
                                       phys[order])
    n = len(src)

    # Group starts: (dst_tile, superblock) changes, every SUB edges, or
    # when the sub-tile window would exceed ``window`` (st is sorted
    # within a block, so the touched range of a run is consecutive).
    block_id = dt * (1 << 32) + sb
    new_block = np.concatenate([[True], block_id[1:] != block_id[:-1]]) \
        if n else np.zeros((0,), bool)
    block_starts = np.nonzero(new_block)[0]
    starts, ends = [], []
    for b0, b1 in zip(block_starts,
                      np.concatenate([block_starts[1:], [n]])):
        i = b0
        sts = st[b0:b1]
        while i < b1:
            j = min(i + SUB, b1)
            jw = b0 + np.searchsorted(sts, st[i] + window, side="left")
            j = min(j, int(jw))
            starts.append(i)
            ends.append(j)
            i = j
    starts = np.asarray(starts, np.int64)
    ends = np.asarray(ends, np.int64)

    # Groups -> chunks by dst tile (gpc per chunk).
    n_dst_tiles = -(-n_dst // tile_dst)
    groups_by_tile = {t: [] for t in range(n_dst_tiles)}
    for gi in range(len(starts)):
        groups_by_tile[int(dt[starts[gi]])].append(gi)

    chunks = []   # list of (dst_tile, [group indices])
    for t in range(n_dst_tiles):
        gs = groups_by_tile[t]
        if not gs:
            chunks.append((t, []))
            continue
        for off in range(0, len(gs), gpc):
            chunks.append((t, gs[off:off + gpc]))

    c = len(chunks)
    span_sub = span * SUB
    g_src = np.zeros((c, gpc, SUB), np.int32)
    g_dst = np.zeros((c, gpc, SUB), np.int32)
    g_val = np.zeros((c, gpc, SUB), np.float32)
    g_eid = np.full((c, gpc, SUB), n, np.int32)
    g_touch = np.zeros((c * gpc,), np.int32)
    g_p0 = np.zeros((c * gpc,), np.int32)
    group_sb = np.zeros((c * gpc,), np.int64)
    group_live = np.zeros((c * gpc,), bool)
    c_dt = np.zeros((c,), np.int32)
    for ci, (t, gs) in enumerate(chunks):
        c_dt[ci] = t
        for gj, gi in enumerate(gs):
            a, b = starts[gi], ends[gi]
            m = b - a
            g_src[ci, gj, :m] = src[a:b] % span_sub
            g_dst[ci, gj, :m] = dst[a:b] % tile_dst
            g_val[ci, gj, :m] = val[a:b]
            g_eid[ci, gj, :m] = phys[a:b]
            pos = ci * gpc + gj
            group_sb[pos] = sb[a]
            group_live[pos] = True
            # Base sub-tile, clamped so [p0, p0 + window) stays inside
            # the span-panel even for groups near the superblock tail.
            p0 = min(int(st[a] - sb[a] * span), span - window)
            g_p0[pos] = p0
            for p in np.unique(st[a:b] - sb[a] * span):
                g_touch[pos] |= 1 << (int(p) - p0)
    first = np.concatenate([[1], (c_dt[1:] != c_dt[:-1]).astype(np.int32)])

    # Panel transitions = maximal live-group runs of equal
    # (dst_tile, superblock) in stream order — the transition must
    # break when the dst tile changes even if the superblock id
    # repeats (different panel epoch).
    dt_of_group = np.repeat(c_dt.astype(np.int64), gpc)
    trans_key = dt_of_group * (1 << 32) + group_sb
    g_meta = np.full((c * gpc,), PAD_META, np.int32)
    trans_sb_list = []
    prev = None
    for g in range(c * gpc):
        if not group_live[g]:
            continue
        if prev is None or trans_key[g] != prev:
            trans_sb_list.append(int(group_sb[g]))
        prev = trans_key[g]
        tid = len(trans_sb_list) - 1
        # Overflow check BEFORE the packed assignment: numpy>=1.24
        # raises a raw OverflowError on an out-of-range int32 store,
        # so both builder paths must fail with the same ValueError
        # ahead of it (the native path checks before filling too).
        if (tid + 1) << shift >= 1 << 31:
            raise ValueError(
                f"{tid + 1} panel transitions with span={span}/"
                f"window={window} overflow the packed int32 schedule; "
                f"use a smaller span")
        g_meta[g] = (tid << shift) | (int(g_p0[g]) << window) \
            | int(g_touch[g])
    trans_sb_arr = np.concatenate(
        [np.asarray(trans_sb_list, np.int32),
         np.full((LEAD,), -1, np.int32)])

    return GroupedCoo(
        src_local=jnp.asarray(g_src), dst_local=jnp.asarray(g_dst),
        val=jnp.asarray(g_val), g_meta=jnp.asarray(g_meta),
        trans_sb=jnp.asarray(trans_sb_arr),
        dst_tile=jnp.asarray(c_dt), first_of_dst=jnp.asarray(first),
        edge_id=jnp.asarray(g_eid), n_src=n_src, n_dst=n_dst, span=span,
        window=window, n_live=int(n), tile_dst=tile_dst)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GroupedCooPair:
    fwd: GroupedCoo
    bwd: GroupedCoo


def grouped_pair_from_arrays(src, dst, val, n_src: int, n_dst: int,
                             span: int | None = None,
                             window: int | None = None,
                             gpc: int | None = None) -> GroupedCooPair:
    return GroupedCooPair(
        fwd=grouped_from_arrays(src, dst, val, n_src, n_dst, span=span,
                                window=window, gpc=gpc),
        bwd=grouped_from_arrays(dst, src, val, n_dst, n_src, span=span,
                                window=window, gpc=gpc))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BipartiteGrouped:
    """Relation-typed bipartite encoder graph, grouped-gather layout.

    The scale-config counterpart of graph/bipartite_coo.BipartiteCoo:
    each (rating, direction) relation is a GroupedCooPair consumed by
    kernels/pallas_spmm_gather.  Mirrors the COO layout's norm
    semantics (degree summed over all relations).
    """

    fwd: tuple        # tuple[GroupedCooPair], len R (drug -> disease)
    rev: tuple        # tuple[GroupedCooPair], len R (disease -> drug)
    ci_drug: jnp.ndarray
    cj_drug: jnp.ndarray
    ci_dis: jnp.ndarray
    cj_dis: jnp.ndarray

    @property
    def num_ratings(self) -> int:
        return len(self.fwd)


def build_enc_graph_grouped(pairs, values, n_drug: int, n_dis: int,
                            symm: bool = True,
                            ratings=(0, 1)) -> BipartiteGrouped:
    pairs = np.asarray(pairs)
    values = np.asarray(values)
    fwd, rev = [], []
    for r in ratings:
        idx = np.where(values == r)[0]
        dr, di = pairs[0][idx], pairs[1][idx]
        ones = np.ones(len(idx), np.float32)
        fwd.append(grouped_pair_from_arrays(dr, di, ones, n_drug, n_dis))
        rev.append(grouped_pair_from_arrays(di, dr, ones, n_dis, n_drug))

    from dream_gnn_tpu.graph.norms import inv_sqrt_norm

    deg_drug = np.bincount(pairs[0], minlength=n_drug).astype(np.float32)
    deg_dis = np.bincount(pairs[1], minlength=n_dis).astype(np.float32)
    ci_drug = jnp.asarray(inv_sqrt_norm(deg_drug))
    ci_dis = jnp.asarray(inv_sqrt_norm(deg_dis))
    cj_drug = ci_drug if symm else jnp.ones((n_drug, 1), jnp.float32)
    cj_dis = ci_dis if symm else jnp.ones((n_dis, 1), jnp.float32)
    return BipartiteGrouped(fwd=tuple(fwd), rev=tuple(rev),
                            ci_drug=ci_drug, cj_drug=cj_drug,
                            ci_dis=ci_dis, cj_dis=cj_dis)

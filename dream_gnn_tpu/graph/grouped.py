"""Grouped-COO layout for the sub-vreg gather SpMM kernel.

Mosaic's ``tpu.dynamic_gather`` shuffles within a single vreg, so a
hardware gather needs its table to span at most 128 lanes.  This layout
therefore organises edges into GROUPS of <=128 edges whose sources all
fall in one 128-row src sub-tile (and whose destinations fall in one
512-row dst tile); the kernel (kernels/pallas_spmm_gather.py) streams
one (d, 128) source panel per group via explicit double-buffered DMA
and gathers rows with the hardware shuffle instead of one-hot matmuls.

Hierarchy: chunk = GROUPS_PER_CHUNK groups sharing a dst tile; groups
are runs of (dst_tile, src_subtile)-sorted edges.  Padding groups carry
``val == 0`` and sub-tile 0.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

SUB = 128                 # src rows per group panel (one vreg of lanes)
TILE_DST_G = 512          # dst rows per output block
GROUPS_PER_CHUNK = 16


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GroupedCoo:
    src_local: jnp.ndarray    # (C, G, 128) int32 in [0, SUB)
    dst_local: jnp.ndarray    # (C, G, 128) int32 in [0, TILE_DST_G)
    val: jnp.ndarray          # (C, G, 128) float32, 0 = padding
    subtile: jnp.ndarray      # (C * G,) int32 — src sub-tile per group
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

    @property
    def n_chunks(self) -> int:
        return self.src_local.shape[0]

    @property
    def n_src_pad(self) -> int:
        return -(-self.n_src // SUB) * SUB

    @property
    def n_dst_pad(self) -> int:
        return -(-self.n_dst // TILE_DST_G) * TILE_DST_G


def grouped_from_arrays(src, dst, val, n_src: int, n_dst: int,
                        use_native: bool = True) -> GroupedCoo:
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    val = np.asarray(val, np.float32)

    # Native C++ builder (one std::sort + linear fill; ~16x the NumPy
    # path at 10M edges).  Output contract is bit-identical — pinned by
    # tests/test_native_builder.py.
    from dream_gnn_tpu.graph import native as _native
    built = _native.build_grouped_native(src, dst, val, n_src, n_dst,
                                         SUB, TILE_DST_G,
                                         GROUPS_PER_CHUNK) \
        if use_native else None
    if built is not None:
        g_src, g_dst, g_val, g_eid, g_sub, c_dt, c_first = built
        return GroupedCoo(
            src_local=jnp.asarray(g_src), dst_local=jnp.asarray(g_dst),
            val=jnp.asarray(g_val), subtile=jnp.asarray(g_sub),
            dst_tile=jnp.asarray(c_dt), first_of_dst=jnp.asarray(c_first),
            edge_id=jnp.asarray(g_eid), n_src=n_src, n_dst=n_dst)
    live = val != 0
    src, dst, val = src[live], dst[live], val[live]
    phys = np.arange(len(src), dtype=np.int64)   # live-edge indexing

    st = src // SUB
    dt = dst // TILE_DST_G
    order = np.lexsort((st, dt))
    src, dst, val, st, dt, phys = (src[order], dst[order], val[order],
                                   st[order], dt[order], phys[order])
    n = len(src)

    # Group starts: block changes or every SUB edges.
    block_id = dt * (1 << 32) + st
    new_block = np.concatenate([[True], block_id[1:] != block_id[:-1]]) \
        if n else np.zeros((0,), bool)
    block_starts = np.nonzero(new_block)[0]
    starts = []
    for b0, b1 in zip(block_starts,
                      np.concatenate([block_starts[1:], [n]])):
        starts.extend(range(b0, b1, SUB))
    starts = np.asarray(starts, np.int64)
    ends = np.minimum(np.concatenate([starts[1:], [n]]) if len(starts)
                      else np.zeros((0,), np.int64), starts + SUB)

    # Groups -> chunks by dst tile (GROUPS_PER_CHUNK per chunk).
    n_dst_tiles = -(-n_dst // TILE_DST_G)
    groups_by_tile = {t: [] for t in range(n_dst_tiles)}
    for gi in range(len(starts)):
        groups_by_tile[int(dt[starts[gi]])].append(gi)

    chunks = []   # list of (dst_tile, [group indices])
    for t in range(n_dst_tiles):
        gs = groups_by_tile[t]
        if not gs:
            chunks.append((t, []))
            continue
        for off in range(0, len(gs), GROUPS_PER_CHUNK):
            chunks.append((t, gs[off:off + GROUPS_PER_CHUNK]))

    c = len(chunks)
    g_src = np.zeros((c, GROUPS_PER_CHUNK, SUB), np.int32)
    g_dst = np.zeros((c, GROUPS_PER_CHUNK, SUB), np.int32)
    g_val = np.zeros((c, GROUPS_PER_CHUNK, SUB), np.float32)
    g_eid = np.full((c, GROUPS_PER_CHUNK, SUB), n, np.int32)
    g_sub = np.zeros((c * GROUPS_PER_CHUNK,), np.int32)
    c_dt = np.zeros((c,), np.int32)
    for ci, (t, gs) in enumerate(chunks):
        c_dt[ci] = t
        for gj, gi in enumerate(gs):
            a, b = starts[gi], ends[gi]
            m = b - a
            g_src[ci, gj, :m] = src[a:b] % SUB
            g_dst[ci, gj, :m] = dst[a:b] % TILE_DST_G
            g_val[ci, gj, :m] = val[a:b]
            g_eid[ci, gj, :m] = phys[a:b]
            g_sub[ci * GROUPS_PER_CHUNK + gj] = st[a]
    first = np.concatenate([[1], (c_dt[1:] != c_dt[:-1]).astype(np.int32)])

    return GroupedCoo(
        src_local=jnp.asarray(g_src), dst_local=jnp.asarray(g_dst),
        val=jnp.asarray(g_val), subtile=jnp.asarray(g_sub),
        dst_tile=jnp.asarray(c_dt), first_of_dst=jnp.asarray(first),
        edge_id=jnp.asarray(g_eid), n_src=n_src, n_dst=n_dst)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GroupedCooPair:
    fwd: GroupedCoo
    bwd: GroupedCoo


def grouped_pair_from_arrays(src, dst, val, n_src: int,
                             n_dst: int) -> GroupedCooPair:
    return GroupedCooPair(
        fwd=grouped_from_arrays(src, dst, val, n_src, n_dst),
        bwd=grouped_from_arrays(dst, src, val, n_dst, n_src))


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

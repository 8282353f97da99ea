"""Mesh-sharded bipartite encoder graph — full-model edge-partitioned
training (BASELINE.json config 5).

The reference has no distributed support of any kind (SURVEY.md §2.C);
this is a first-class new component.  For graphs too large for one
chip, every (rating, direction) relation of the encoder heterograph is
a dst-partitioned ``ShardedCoo`` (sharding/edge_partition.py): each
device owns a contiguous destination-row range and the edge block
targeting it, and source features are all-gathered over ICI inside a
``shard_map`` (the halo exchange) before the local aggregation.

``BipartiteSharded`` slots into the same ``gcmc_layer_apply`` relation
loop as the dense / padded-COO / grouped layouts (nn/gcmc.py), so the
standard ``make_train_fns`` factories produce a *full* training step —
dual-route forward, BCE loss, backward (XLA transposes the all_gather
to a reduce_scatter), Adam — compiled over the mesh.  Numerics are
pinned to the single-device COO path by tests/test_sharded_scale.py on
a virtual 8-device mesh.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dream_gnn_tpu.graph.coo import coo_from_arrays
from dream_gnn_tpu.graph.norms import inv_sqrt_norm
from dream_gnn_tpu.sharding.edge_partition import (ShardedCoo,
                                                   put_sharded_coo,
                                                   shard_coo_by_dst)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BipartiteSharded:
    """Relation-typed bipartite encoder graph, dst-sharded over a mesh
    axis.  ``fwd[r]``: drug -> disease edges of rating r (dst = disease
    rows sharded); ``rev[r]``: disease -> drug (dst = drug rows).
    Norm semantics follow data_loader.py:453-488 (degree summed over
    all relations)."""

    fwd: tuple        # tuple[ShardedCoo], len R
    rev: tuple        # tuple[ShardedCoo], len R
    ci_drug: jnp.ndarray
    cj_drug: jnp.ndarray
    ci_dis: jnp.ndarray
    cj_dis: jnp.ndarray
    mesh: Mesh = dataclasses.field(metadata=dict(static=True))
    axis: str = dataclasses.field(metadata=dict(static=True))

    @property
    def n_drug(self) -> int:
        return self.rev[0].n_dst

    @property
    def n_dis(self) -> int:
        return self.fwd[0].n_dst

    @property
    def num_ratings(self) -> int:
        return len(self.fwd)

    def num_edges(self) -> float:
        return float(sum(int((g.val != 0).sum()) for g in self.fwd)
                     + sum(int((g.val != 0).sum()) for g in self.rev))


def build_enc_graph_sharded(pairs, values, n_drug: int, n_dis: int,
                            mesh: Mesh, axis: str, symm: bool = True,
                            ratings=(0, 1),
                            pad_multiple: int = 512) -> BipartiteSharded:
    """Partition the encoder heterograph across ``mesh[axis]`` and
    device_put every edge block on its owning shard."""
    pairs = np.asarray(pairs)
    values = np.asarray(values)
    n_shards = mesh.shape[axis]
    fwd, rev = [], []
    for r in ratings:
        idx = np.where(values == r)[0]
        dr, di = pairs[0][idx], pairs[1][idx]
        ones = np.ones(len(idx), np.float32)
        fwd.append(shard_coo_by_dst(
            coo_from_arrays(dr, di, ones, n_drug, n_dis), n_shards,
            pad_multiple))
        rev.append(shard_coo_by_dst(
            coo_from_arrays(di, dr, ones, n_dis, n_drug), n_shards,
            pad_multiple))

    deg_drug = np.bincount(pairs[0], minlength=n_drug).astype(np.float32)
    deg_dis = np.bincount(pairs[1], minlength=n_dis).astype(np.float32)
    ci_drug = jnp.asarray(inv_sqrt_norm(deg_drug))
    ci_dis = jnp.asarray(inv_sqrt_norm(deg_dis))
    cj_drug = ci_drug if symm else jnp.ones((n_drug, 1), jnp.float32)
    cj_dis = ci_dis if symm else jnp.ones((n_dis, 1), jnp.float32)

    rep = NamedSharding(mesh, P())
    return BipartiteSharded(
        fwd=tuple(put_sharded_coo(mesh, axis, g) for g in fwd),
        rev=tuple(put_sharded_coo(mesh, axis, g) for g in rev),
        ci_drug=jax.device_put(ci_drug, rep),
        cj_drug=jax.device_put(cj_drug, rep),
        ci_dis=jax.device_put(ci_dis, rep),
        cj_dis=jax.device_put(cj_dis, rep),
        mesh=mesh, axis=axis)


# ---------------------------------------------------------------------------
# Sharded-grouped: the Pallas gather kernel per shard inside the halo
# exchange — the production multi-chip scale path (speed-of-light local
# aggregation + ICI all_gather).


def _pad_chunks(g, c_max: int, n_pad_val: int, t_max: int):
    """Pad a GroupedCoo to ``c_max`` chunks and ``t_max`` panel
    transitions (padding chunks carry val=0, meta=PAD_META, dst_tile=0,
    first=0 — the kernel skips their gathers/matmuls and they
    accumulate nothing).  Also normalises the static ``n_live`` to the
    GLOBAL live count (``n_pad_val``): per-shard layouts get stacked
    leaf-wise, which requires identical treedefs and leaf shapes —
    per-shard static metadata must match."""
    import dataclasses as _dc

    from dream_gnn_tpu.graph.grouped import LEAD, PAD_META

    gpc = g.src_local.shape[1]      # layout-adaptive groups per chunk
    tpad = t_max + LEAD - g.trans_sb.shape[0]
    g = _dc.replace(
        g, n_live=n_pad_val,
        trans_sb=jnp.concatenate(
            [g.trans_sb, jnp.full((tpad,), -1, jnp.int32)]))
    c = g.n_chunks
    if c == c_max:
        return g
    pc = c_max - c
    pad3 = lambda a, v=0: jnp.concatenate(
        [a, jnp.full((pc,) + a.shape[1:], v, a.dtype)], axis=0)
    padg = lambda a, v=0: jnp.concatenate(
        [a, jnp.full((pc * gpc,), v, a.dtype)], axis=0)
    return _dc.replace(
        g,
        src_local=pad3(g.src_local), dst_local=pad3(g.dst_local),
        val=pad3(g.val), edge_id=pad3(g.edge_id, n_pad_val),
        g_meta=padg(g.g_meta, PAD_META),
        dst_tile=pad3(g.dst_tile), first_of_dst=pad3(g.first_of_dst))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BipartiteShardedGrouped:
    """Like BipartiteSharded, but each shard's local edge block is a
    GroupedCooPair (graph/grouped.py) so local aggregation runs through
    the sub-vreg gather Pallas kernel instead of XLA segment_sum.
    Every GroupedCoo leaf carries a leading shard axis S (chunk counts
    padded to the max across shards); edge_id is globalised with a
    per-shard base so PRF edge-dropout masks stay iid across shards and
    consistent between each shard's fwd/bwd layouts.

    ``ring=True`` marks the overlapped-halo layout: leaves carry
    (S, J=S, ...) with sub-block j of dst-shard s holding the edges
    whose sources live in src-block (s + j) % S, in ring-schedule
    order (see ``spmm_gather_sharded_ring``).  Ring graphs store node
    counts explicitly (sub-blocks are src-block-local)."""

    fwd: tuple        # tuple[GroupedCooPair], leaves (S, ...)
    rev: tuple
    ci_drug: jnp.ndarray
    cj_drug: jnp.ndarray
    ci_dis: jnp.ndarray
    cj_dis: jnp.ndarray
    mesh: Mesh = dataclasses.field(metadata=dict(static=True))
    axis: str = dataclasses.field(metadata=dict(static=True))
    ring: bool = dataclasses.field(default=False,
                                   metadata=dict(static=True))
    n_drug_: int = dataclasses.field(default=0,
                                     metadata=dict(static=True))
    n_dis_: int = dataclasses.field(default=0,
                                    metadata=dict(static=True))

    @property
    def n_drug(self) -> int:
        return self.n_drug_ or self.fwd[0].fwd.n_src  # fwd src = drug

    @property
    def n_dis(self) -> int:
        return self.n_dis_ or self.rev[0].fwd.n_src   # rev src = disease

    @property
    def num_ratings(self) -> int:
        return len(self.fwd)


def _sharded_grouped_pairs(src, dst, val, n_src: int, n_dst: int,
                           n_shards: int):
    """Per-shard GroupedCooPairs (dst-partitioned), leaves stacked with
    a leading shard axis."""
    import dataclasses as _dc

    from dream_gnn_tpu.graph.grouped import (GroupedCooPair, auto_gpc,
                                             auto_span_window,
                                             grouped_pair_from_arrays)

    rps = -(-n_dst // n_shards)
    # Resolve the density-adaptive layout geometry ONCE from the full
    # relation: per-shard edge counts jitter, and stacked shards must
    # share identical static (span, window, gpc) to tree-stack.
    n_live_shard = int((val != 0).sum()) // n_shards
    span, window = auto_span_window(n_live_shard, n_src, rps)
    gpc = auto_gpc(n_live_shard, rps)
    pairs = []
    base = 0
    for s in range(n_shards):
        m = (dst // rps) == s
        p = grouped_pair_from_arrays(src[m], dst[m] - s * rps, val[m],
                                     n_src, rps, span=span,
                                     window=window, gpc=gpc)
        n_local = int(m.sum())
        p = GroupedCooPair(
            fwd=_dc.replace(p.fwd, edge_id=p.fwd.edge_id + base),
            bwd=_dc.replace(p.bwd, edge_id=p.bwd.edge_id + base))
        pairs.append(p)
        base += n_local
    cf = max(p.fwd.n_chunks for p in pairs)
    cb = max(p.bwd.n_chunks for p in pairs)
    from dream_gnn_tpu.graph.grouped import LEAD as _LEAD
    tf = max(p.fwd.trans_sb.shape[0] for p in pairs) - _LEAD
    tb = max(p.bwd.trans_sb.shape[0] for p in pairs) - _LEAD
    pairs = [GroupedCooPair(fwd=_pad_chunks(p.fwd, cf, base, tf),
                            bwd=_pad_chunks(p.bwd, cb, base, tb))
             for p in pairs]
    return jax.tree.map(lambda *ls: jnp.stack(ls), *pairs), rps


def _sharded_grouped_pairs_ring(src, dst, val, n_src: int, n_dst: int,
                                n_shards: int):
    """(S, J=S) grid of GroupedCooPairs for the overlapped halo
    exchange: for dst-shard s, sub-block j holds the edges whose src
    falls in block (s + j) % S, with *block-local* src indices — the
    order each shard consumes source blocks as the ring rotates.
    Returns (stacked pair with leading (S, J) axes, rows_per_dst_shard,
    rows_per_src_block)."""
    import dataclasses as _dc

    from dream_gnn_tpu.graph.grouped import (GroupedCooPair, auto_gpc,
                                             auto_span_window,
                                             grouped_pair_from_arrays)

    rps_dst = -(-n_dst // n_shards)
    rps_src = -(-n_src // n_shards)
    # One (span, window, gpc) for every sub-block (stacking needs
    # uniform statics); sub-block density equals the full relation's.
    # gpc adapts to the SUB-BLOCK size (VERDICT r4 #3): at S=16 the
    # 39k-edge sub-blocks padded each dst tile's ~23.5 slots to 32
    # under gpc=16 (occ 0.73); gpc=8 recovers ~0.9.
    n_live_sub = int((val != 0).sum()) // (n_shards * n_shards)
    span, window = auto_span_window(n_live_sub, rps_src, rps_dst)
    gpc = auto_gpc(n_live_sub, rps_dst)
    grid = []
    base = 0
    for s in range(n_shards):
        row = []
        for j in range(n_shards):
            b = (s + j) % n_shards
            m = ((dst // rps_dst) == s) & ((src // rps_src) == b)
            p = grouped_pair_from_arrays(
                src[m] - b * rps_src, dst[m] - s * rps_dst, val[m],
                rps_src, rps_dst, span=span, window=window, gpc=gpc)
            n_local = int(m.sum())
            p = GroupedCooPair(
                fwd=_dc.replace(p.fwd, edge_id=p.fwd.edge_id + base),
                bwd=_dc.replace(p.bwd, edge_id=p.bwd.edge_id + base))
            row.append(p)
            base += n_local
        grid.append(row)
    cf = max(p.fwd.n_chunks for row in grid for p in row)
    cb = max(p.bwd.n_chunks for row in grid for p in row)
    from dream_gnn_tpu.graph.grouped import LEAD as _LEAD
    tf = max(p.fwd.trans_sb.shape[0] for row in grid for p in row) - _LEAD
    tb = max(p.bwd.trans_sb.shape[0] for row in grid for p in row) - _LEAD
    grid = [[GroupedCooPair(fwd=_pad_chunks(p.fwd, cf, base, tf),
                            bwd=_pad_chunks(p.bwd, cb, base, tb))
             for p in row] for row in grid]
    rows = [jax.tree.map(lambda *ls: jnp.stack(ls), *row) for row in grid]
    return jax.tree.map(lambda *ls: jnp.stack(ls), *rows), rps_dst, rps_src


def spmm_gather_sharded_ring(mesh: Mesh, axis: str, pair,
                             x: jnp.ndarray, n_dst: int,
                             rows_per_shard: int) -> jnp.ndarray:
    """Dst-sharded SpMM with the halo exchange OVERLAPPED with local
    aggregation (BASELINE.json config 5: "all-to-all overlapped with
    local aggregation", SURVEY §7.2.8 "double-buffered overlap").

    Source rows stay sharded: at ring step j each shard aggregates the
    edge sub-block whose source block is currently resident while
    ``ppermute`` rotates the next block over ICI.  The permute and the
    Pallas gather kernel have no data dependence, so XLA's
    latency-hiding scheduler runs them concurrently — peak memory is
    2 source blocks instead of the full all-gathered matrix, and the
    interconnect rides under the compute.  Backward transposes to the
    reverse ring automatically (custom VJP per sub-block + ppermute
    transpose)."""
    from functools import partial

    from jax import shard_map

    from dream_gnn_tpu.kernels.pallas_spmm_gather import spmm_gather

    n_shards = mesh.shape[axis]
    rps_src = pair.fwd.n_src          # static: src rows per block
    d = x.shape[1]
    n_pad_src = n_shards * rps_src
    if x.shape[0] != n_pad_src:
        x = jnp.pad(x, ((0, n_pad_src - x.shape[0]), (0, 0)))
    perm = [(i, (i - 1) % n_shards) for i in range(n_shards)]

    @partial(shard_map, mesh=mesh, in_specs=(P(axis), P(axis)),
             out_specs=P(axis), check_vma=False)
    def _local(pair_block, x_block):
        buf = x_block[0]                            # (rps_src, d)
        acc = jnp.zeros((rows_per_shard, d), jnp.float32)
        for j in range(n_shards):
            sub = jax.tree.map(lambda a: a[0, j], pair_block)
            acc = acc + spmm_gather(sub, buf)
            if j < n_shards - 1:
                buf = jax.lax.ppermute(buf, axis, perm)
        return acc[None]

    out = _local(pair, x.reshape(n_shards, rps_src, d))
    return out.reshape(-1, d)[:n_dst]


def spmm_gather_sharded(mesh: Mesh, axis: str, pair, x: jnp.ndarray,
                        n_dst: int, rows_per_shard: int) -> jnp.ndarray:
    """Dst-sharded SpMM with per-shard Pallas gather-kernel local
    aggregation and all_gather halo exchange.  ``pair`` is a stacked
    GroupedCooPair (leading shard axis on every leaf); ``x`` is
    (n_src, d), row-sharded over ``axis``.  Returns (n_dst, d)
    row-sharded."""
    from functools import partial

    from jax import shard_map

    from dream_gnn_tpu.kernels.pallas_spmm_gather import spmm_gather

    n_shards = mesh.shape[axis]
    n_pad_src = n_shards * (-(-x.shape[0] // n_shards))
    if x.shape[0] != n_pad_src:
        x = jnp.pad(x, ((0, n_pad_src - x.shape[0]), (0, 0)))

    # check_vma=False: pallas_call's out ShapeDtypeStruct carries no
    # varying-mesh-axes annotation, which the checker (on by default)
    # rejects inside shard_map.
    @partial(shard_map, mesh=mesh, in_specs=(P(axis), P(axis)),
             out_specs=P(axis), check_vma=False)
    def _local(pair_block, x_block):
        x_full = jax.lax.all_gather(x_block[0], axis, axis=0, tiled=True)
        local = jax.tree.map(lambda a: a[0], pair_block)
        out = spmm_gather(local, x_full[: local.fwd.n_src])
        if out.shape[0] != rows_per_shard:
            raise ValueError(
                f"local SpMM rows {out.shape[0]} != rows_per_shard "
                f"{rows_per_shard}")
        return out[None]

    out = _local(pair, x.reshape(n_shards, -1, x.shape[1]))
    return out.reshape(-1, x.shape[-1])[:n_dst]


def build_enc_graph_sharded_grouped(pairs, values, n_drug: int,
                                    n_dis: int, mesh: Mesh, axis: str,
                                    symm: bool = True,
                                    ratings=(0, 1), ring: bool = False):
    """BipartiteShardedGrouped builder + device placement.  With
    ``ring=True``, edges are additionally partitioned by source block
    in ring-schedule order for the overlapped halo exchange
    (``spmm_gather_sharded_ring``)."""
    pairs = np.asarray(pairs)
    values = np.asarray(values)
    n_shards = mesh.shape[axis]
    build = (lambda *a: _sharded_grouped_pairs_ring(*a)[0]) if ring \
        else (lambda *a: _sharded_grouped_pairs(*a)[0])
    fwd, rev = [], []
    for r in ratings:
        idx = np.where(values == r)[0]
        dr, di = pairs[0][idx], pairs[1][idx]
        ones = np.ones(len(idx), np.float32)
        fwd.append(build(dr, di, ones, n_drug, n_dis, n_shards))
        rev.append(build(di, dr, ones, n_dis, n_drug, n_shards))

    deg_drug = np.bincount(pairs[0], minlength=n_drug).astype(np.float32)
    deg_dis = np.bincount(pairs[1], minlength=n_dis).astype(np.float32)
    ci_drug = jnp.asarray(inv_sqrt_norm(deg_drug))
    ci_dis = jnp.asarray(inv_sqrt_norm(deg_dis))
    cj_drug = ci_drug if symm else jnp.ones((n_drug, 1), jnp.float32)
    cj_dis = ci_dis if symm else jnp.ones((n_dis, 1), jnp.float32)

    rep = NamedSharding(mesh, P())
    shd = NamedSharding(mesh, P(axis))
    put = lambda t: jax.tree.map(lambda a: jax.device_put(a, shd), t)
    return BipartiteShardedGrouped(
        fwd=tuple(put(g) for g in fwd), rev=tuple(put(g) for g in rev),
        ci_drug=jax.device_put(ci_drug, rep),
        cj_drug=jax.device_put(cj_drug, rep),
        ci_dis=jax.device_put(ci_dis, rep),
        cj_dis=jax.device_put(cj_dis, rep),
        mesh=mesh, axis=axis, ring=ring,
        n_drug_=n_drug if ring else 0, n_dis_=n_dis if ring else 0)

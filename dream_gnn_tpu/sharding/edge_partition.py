"""Edge-partitioned SpMM across a device mesh.

The GNN analogue of tensor/sequence parallelism (SURVEY.md §2.C): for
graphs too large for one chip, destination nodes are partitioned into
contiguous shards, each device owns the edge block whose destinations
are local, and source-node features are exchanged before the local
segment-sum — the halo exchange.  Collectives are XLA's (all_gather
over the mesh axis, riding ICI); with source features already sharded,
XLA overlaps the gather with local aggregation.

Host-side partitioning is one stable sort; device-side the op is a
``shard_map`` around the same weighted segment-sum used everywhere else
(kernels/spmm.py), so numerics are identical to the unsharded path
(pinned by tests/test_edge_partition.py).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from dream_gnn_tpu.graph.coo import CooGraph


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShardedCoo:
    """Dst-partitioned COO: every leaf has leading shard axis S.

    ``dst_local`` is the destination index *within* the shard's
    contiguous row range [shard * rows_per_shard, ...).
    """

    src: jnp.ndarray          # (S, E_shard) int32
    dst_local: jnp.ndarray    # (S, E_shard) int32
    val: jnp.ndarray          # (S, E_shard) float32 (0 = padding)
    n_src: int = dataclasses.field(metadata=dict(static=True))
    n_dst: int = dataclasses.field(metadata=dict(static=True))
    rows_per_shard: int = dataclasses.field(metadata=dict(static=True))

    @property
    def n_shards(self) -> int:
        return self.src.shape[0]


def shard_coo_by_dst(g: CooGraph, n_shards: int,
                     pad_multiple: int = 512) -> ShardedCoo:
    """Partition a dst-sorted CooGraph into contiguous dst ranges."""
    src = np.asarray(g.src)
    dst = np.asarray(g.dst)
    val = np.asarray(g.val)
    live = val != 0
    src, dst, val = src[live], dst[live], val[live]

    rows_per_shard = -(-g.n_dst // n_shards)
    shard_of = dst // rows_per_shard
    order = np.argsort(shard_of, kind="stable")
    src, dst, val, shard_of = (src[order], dst[order], val[order],
                               shard_of[order])

    counts = np.bincount(shard_of, minlength=n_shards)
    e_shard = -(-max(int(counts.max()), 1) // pad_multiple) * pad_multiple
    s_src = np.zeros((n_shards, e_shard), np.int32)
    s_dst = np.zeros((n_shards, e_shard), np.int32)
    s_val = np.zeros((n_shards, e_shard), np.float32)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    for s in range(n_shards):
        a, b = offsets[s], offsets[s + 1]
        s_src[s, : b - a] = src[a:b]
        s_dst[s, : b - a] = dst[a:b] - s * rows_per_shard
        s_val[s, : b - a] = val[a:b]
    return ShardedCoo(src=jnp.asarray(s_src), dst_local=jnp.asarray(s_dst),
                      val=jnp.asarray(s_val), n_src=g.n_src, n_dst=g.n_dst,
                      rows_per_shard=rows_per_shard)


def put_sharded_coo(mesh: Mesh, axis: str, g: ShardedCoo) -> ShardedCoo:
    ns = NamedSharding(mesh, P(axis))
    return dataclasses.replace(
        g, src=jax.device_put(g.src, ns),
        dst_local=jax.device_put(g.dst_local, ns),
        val=jax.device_put(g.val, ns))


def spmm_sharded(mesh: Mesh, axis: str, g: ShardedCoo,
                 x: jnp.ndarray, x_sharded: bool = True) -> jnp.ndarray:
    """out[d] = sum val_e * x[src_e], dst-sharded over ``axis``.

    Args:
      x: (n_src, d) source features.  With ``x_sharded`` the rows are
        sharded over ``axis`` and all-gathered inside the shard_map
        (the halo exchange); otherwise x is replicated.
    Returns (n_shards * rows_per_shard, d), row-sharded over ``axis``
    (trailing pad rows are zero).
    """
    n_pad_src = g.n_shards * (-(-g.n_src // g.n_shards))
    if x_sharded and x.shape[0] != n_pad_src:
        x = jnp.pad(x, ((0, n_pad_src - x.shape[0]), (0, 0)))

    in_specs = (P(axis), P(axis), P(axis),
                P(axis) if x_sharded else P())

    @partial(shard_map, mesh=mesh, in_specs=in_specs, out_specs=P(axis))
    def _local(src, dst_local, val, x_block):
        if x_sharded:
            # Halo exchange: gather all source-feature shards over ICI.
            x_full = jax.lax.all_gather(x_block[0], axis, axis=0,
                                        tiled=True)
        else:
            x_full = x_block
        msg = x_full[src[0]] * val[0][:, None]
        out = jax.ops.segment_sum(msg, dst_local[0],
                                  num_segments=g.rows_per_shard)
        return out[None]

    out = _local(g.src, g.dst_local, g.val,
                 x.reshape(g.n_shards, -1, x.shape[1]) if x_sharded else x)
    return out.reshape(-1, x.shape[-1])

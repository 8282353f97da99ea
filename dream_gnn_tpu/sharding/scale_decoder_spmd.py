"""Candidate-sharded SPMD scale decoder.

Composes the streaming scale decoder (kernels/pallas_scale_decoder.py
— the TPU replacement for the reference's ``apply_edges`` + MLP
decoder, /root/reference/layers.py:341-379, at node counts beyond the
VMEM fused kernel) with a device mesh: the candidate list partitions
into contiguous chunks, one per shard, and every device runs the
UNMODIFIED per-shard kernels on its own drug-/dis-sorted stream
layouts against replicated projection tables.

Why candidate-parallel is the right axis on TPU: the kernel's cost is
per-candidate streaming work (panel DMA + sub-vreg gathers + MLP),
while its inputs are two smallish node tables (N x 128) — so sharding
the 1M-edge dimension divides the dominant cost S ways and the only
collectives are gradient reductions.  ``shard_map``'s transpose
inserts them automatically: the projection tables and MLP weights
enter replicated (``P(None)``), so their per-shard cotangents are
``psum``-reduced over the axis — the same pattern as
``fused_grid_decoder_spmd2d``.

Dropout stays EXACTLY the single-device stream: masks are a
murmur-PRF of (seed, edge id, unit) and the per-shard layouts carry
GLOBAL candidate ids, so a sharded run with the same seed draws
bit-identical masks to the unsharded kernel (pinned by
tests/test_scale_decoder_spmd.py).

Static-shape discipline for stacking (leaf-wise ``jnp.stack`` needs
identical treedefs): every chunk's stream layouts are built with a
common rank-space (``rank_pad`` = chunk size), chunk/transition
counts pad to the cross-shard max (``_pad_chunks``), and the
slot-indexed side arrays pad to the common slot count.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P

from dream_gnn_tpu.graph.grouped import LEAD
from dream_gnn_tpu.kernels.pallas_scale_decoder import (
    ScaleDecoderLayout, build_scale_decoder_layout, scale_decoder)
from dream_gnn_tpu.sharding.scale_graph import _pad_chunks


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShardedScaleDecoderLayout:
    """Per-shard ScaleDecoderLayouts, every array leaf stacked with a
    leading shard axis S.  ``chunk`` is the candidate count per shard
    (last shard may own fewer live candidates; its layout padding
    carries weight 0)."""

    layouts: ScaleDecoderLayout   # leaves (S, ...)
    chunk: int = dataclasses.field(metadata=dict(static=True))
    n_edges_: int = dataclasses.field(metadata=dict(static=True))
    # Mesh/axis captured at build time (like BipartiteShardedGrouped)
    # so model-level dispatch (model/dream_gnn.py) can route a
    # ``dec_layout`` of this type through the SPMD wrapper without a
    # separate mesh argument.
    mesh: object = dataclasses.field(default=None,
                                     metadata=dict(static=True))
    axis: str | None = dataclasses.field(default=None,
                                         metadata=dict(static=True))

    @property
    def n_shards(self) -> int:
        return self.layouts.dis_of_slot.shape[0]

    @property
    def n_pos(self) -> int:
        """Slots per shard."""
        return int(self.layouts.dis_of_slot.shape[1])

    @property
    def n_edges(self) -> int:
        return self.n_edges_

    def slot_labels(self, labels):
        """(S, n_pos) labels/weights in each shard's slot order, from
        the GLOBAL per-candidate label vector (stream edge ids are
        global; padding ids point at the appended zero).  Static per
        fold — call once at setup."""
        lab = jnp.concatenate([jnp.asarray(labels, jnp.float32),
                               jnp.zeros((1,), jnp.float32)])
        s = self.n_shards
        eid = self.layouts.fwd.edge_id.reshape(s, -1)
        return lab[eid], self.layouts.fwd.val.reshape(s, -1)

    def global_slot(self) -> np.ndarray:
        """(E,) physical candidate -> row in the flattened (S * n_pos)
        sharded logit vector (eval-only unscramble)."""
        s = self.n_shards
        inv = np.asarray(self.layouts.inv_slot)          # (S, chunk)
        base = (np.arange(s) * self.n_pos)[:, None]
        return (inv + base).reshape(-1)[: self.n_edges].astype(np.int32)


def _globalise_stream(g, base: int, e_local: int, e_global: int):
    """Remap a stream layout's chunk-local candidate ids to global ids
    (padding sentinel e_local -> e_global) so PRF dropout masks and
    label gathers see the global candidate index."""
    eid = np.asarray(g.edge_id)
    return dataclasses.replace(g, edge_id=jnp.asarray(
        np.where(eid < e_local, eid + base, e_global).astype(np.int32)))


def _pad_1d(a, n: int, fill):
    a = np.asarray(a)
    out = np.full((n,), fill, a.dtype)
    out[: a.shape[0]] = a
    return out


def build_scale_decoder_layout_sharded(
        dec_src, dec_dst, n_drug: int, n_dis: int, n_shards: int,
        mesh=None, axis: str | None = None) -> ShardedScaleDecoderLayout:
    """Partition a candidate list into ``n_shards`` contiguous chunks
    and build stackable per-shard layouts.  With ``mesh``/``axis`` the
    stacked leaves are device_put row-sharded over that axis."""
    dec_src = np.asarray(dec_src, np.int64)
    dec_dst = np.asarray(dec_dst, np.int64)
    e = len(dec_src)
    if e < n_shards:
        raise ValueError(f"{e} candidates < {n_shards} shards")
    chunk = -(-e // n_shards)
    # Ceil-chunking can strand a shard with ZERO candidates even when
    # e >= n_shards (e=5, n_shards=4 -> chunks 2,2,1,0), and an empty
    # chunk crashes deep inside _stream_layout.  Reject it up front.
    if (n_shards - 1) * chunk >= e:
        raise ValueError(
            f"ceil-chunking {e} candidates over {n_shards} shards leaves "
            f"the last shard empty (chunk={chunk}); use fewer shards "
            f"(need e > (n_shards-1)*ceil(e/n_shards))")

    per, e_locs = [], []
    for s in range(n_shards):
        lo, hi = s * chunk, min(e, (s + 1) * chunk)
        per.append(build_scale_decoder_layout(
            dec_src[lo:hi], dec_dst[lo:hi], n_drug, n_dis,
            rank_pad=chunk, build_seq=False))
        e_locs.append(hi - lo)

    # Globalise the stream layouts' candidate ids (PRF masks, labels).
    per = [dataclasses.replace(
        lay,
        fwd=_globalise_stream(lay.fwd, s * chunk, e_locs[s], e),
        mirror=_globalise_stream(lay.mirror, s * chunk, e_locs[s], e))
        for s, lay in enumerate(per)]

    # Common chunk/transition counts per layout family.
    def _maxes(get):
        gs = [get(lay) for lay in per]
        return (max(g.n_chunks for g in gs),
                max(g.trans_sb.shape[0] for g in gs) - LEAD)

    cf, tf = _maxes(lambda l: l.fwd)
    cm, tm = _maxes(lambda l: l.mirror)
    csd, tsd = _maxes(lambda l: l.scat_drug)
    csv, tsv = _maxes(lambda l: l.scat_dis)

    stacked = []
    for lay in per:
        fwd = _pad_chunks(lay.fwd, cf, e, tf)
        mirror = _pad_chunks(lay.mirror, cm, e, tm)
        n_pos_new = int(np.prod(fwd.val.shape))
        n_mpos_new = int(np.prod(mirror.val.shape))
        old_sent = lay.n_pos
        gp = np.asarray(lay.gout_perm)
        gp = np.where(gp == old_sent, n_pos_new, gp)
        # The scatter layouts' slot space (n_src) grows with the
        # padded stream: the extra rows carry no groups, the kernel
        # just streams a few more all-zero da1 panels.
        scat_drug = _pad_chunks(
            dataclasses.replace(lay.scat_drug, n_src=n_pos_new),
            csd, e, tsd)
        scat_dis = _pad_chunks(
            dataclasses.replace(lay.scat_dis, n_src=n_mpos_new),
            csv, e, tsv)
        stacked.append(ScaleDecoderLayout(
            fwd=fwd, mirror=mirror, scat_drug=scat_drug,
            scat_dis=scat_dis,
            dis_of_slot=jnp.asarray(
                _pad_1d(lay.dis_of_slot, n_pos_new, 0)),
            drug_of_mslot=jnp.asarray(
                _pad_1d(lay.drug_of_mslot, n_mpos_new, 0)),
            gout_perm=jnp.asarray(
                _pad_1d(gp, n_mpos_new, n_pos_new).astype(np.int32)),
            inv_slot=jnp.asarray(_pad_1d(lay.inv_slot, chunk, 0)),
            n_drug=n_drug, n_dis=n_dis))

    layouts = jax.tree.map(lambda *ls: jnp.stack(ls), *stacked)
    if mesh is not None:
        shd = NamedSharding(mesh, P(axis))
        layouts = jax.tree.map(lambda a: jax.device_put(a, shd), layouts)
    return ShardedScaleDecoderLayout(layouts=layouts, chunk=chunk,
                                     n_edges_=e, mesh=mesh, axis=axis)


def scale_decoder_spmd(mesh, axis: str, slay: ShardedScaleDecoderLayout,
                       proj_drug, proj_dis, b1, w2, b2, w3, b3, seed,
                       *, rate: float, train: bool,
                       dtype=jnp.bfloat16):
    """Sharded logits (S, n_pos), candidate chunks over ``axis``.

    Tables/weights enter replicated; shard_map's transpose psums their
    cotangents over the axis, so ``jax.grad`` through this equals the
    single-device ``scale_decoder`` gradients exactly (same PRF
    dropout masks — global candidate ids ride in the layouts)."""

    @partial(jax.shard_map, mesh=mesh, check_vma=False,
             in_specs=(P(axis), P(None, None), P(None, None), P(None),
                       P(None, None), P(None), P(None), P(None),
                       P(None)),
             out_specs=P(axis))
    def _local(lay, pd, pv, b1l, w2l, b2l, w3l, b3l, sl):
        local = jax.tree.map(lambda a: a[0], lay)
        out = scale_decoder(rate, train, dtype, local, pd, pv, b1l,
                            w2l, b2l, w3l, b3l, sl)
        return out[None]

    return _local(slay.layouts, proj_drug, proj_dis, b1, w2, b2, w3,
                  b3, seed)


def decoder_apply_scale_spmd(params, slay: ShardedScaleDecoderLayout,
                             drug_feat, dis_feat, mesh, axis: str, *,
                             dropout_rate: float, train: bool = False,
                             key=None, dtype=jnp.bfloat16):
    """Drop-in sharded counterpart of ``decoder_apply_scale``: XLA
    node projections (replicated — w1/feature grads via the chain
    rule) + the SPMD per-edge pipeline.  Returns (S, n_pos) slot-order
    logits; pair with ``slay.slot_labels`` / ``slay.global_slot``."""
    d = drug_feat.shape[1]
    proj_drug = jnp.dot(drug_feat.astype(dtype),
                        params["w1"][:d].astype(dtype),
                        preferred_element_type=jnp.float32)
    proj_dis = jnp.dot(dis_feat.astype(dtype),
                       params["w1"][d:].astype(dtype),
                       preferred_element_type=jnp.float32)
    if train and dropout_rate > 0.0:
        assert key is not None
        seed = jax.random.randint(key, (1,), 0, np.iinfo(np.int32).max,
                                  dtype=jnp.int32)
    else:
        seed = jnp.zeros((1,), jnp.int32)
    return scale_decoder_spmd(
        mesh, axis, slay, proj_drug, proj_dis, params["b1"],
        params["w2"], params["b2"], params["w3"][:, 0], params["b3"],
        seed, rate=dropout_rate, train=train, dtype=dtype)

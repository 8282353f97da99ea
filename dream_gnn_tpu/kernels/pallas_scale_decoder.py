"""Scale fused per-edge MLP decoder — Pallas TPU kernels (large-N).

Replaces the reference's ``apply_edges`` + MLP decoder
(/root/reference/layers.py:341-379,364) at framework scale: the
VMEM-resident fused decoder (kernels/pallas_decoder.py) caps at
``MAX_ONEHOT_NODES`` = 8192 because it holds whole (N, H1) projection
tables in VMEM; at the synthetic scale config (100k nodes, 1M
candidates) the XLA fallback cost ~39 ms of the 352 ms training step
(VERDICT r3 #2).

Design — shaped by three measurements on the real chip (all in
docs/kernels.md §8):

1. The SpMM kernel's joint (dst-tile x src-window) confinement fails
   at candidate density (~10x sparser than the 10M-edge graph):
   groups fill only at window=8 and a kernel built that way measured
   12.5 ms forward — the 8-deep select tree dominates, no better than
   XLA.  Single-axis-sorted streams are nearly free instead: 128
   consecutive drug-sorted edges span ~13 drug rows -> window 3,
   occupancy ~1.0, and the drug table streams as ONE sequential panel
   sweep (25.6 MB, not n_dst_tiles * table).
2. XLA's row-gather cost is set by the SOURCE working set: gathering
   1M 256-B rows from a 100k-row table costs 1.7 ms, but permuting a
   1M-row buffer costs 11.4 ms (and Mosaic cannot express arbitrary-
   sublane row moves, so no Pallas permute rescues it).  Therefore:
   gather the NON-streamed side's rows from its SMALL table with XLA,
   directly in the stream's slot order — never permute a big per-edge
   buffer.
3. XLA's scatter-add into the tables costs 15.6 ms — so table
   gradients must NOT use XLA scatter.  A scatter-add of per-edge
   vectors into node rows IS the grouped-gather SpMM
   (kernels/pallas_spmm_gather.py) when the "source table" is the
   per-edge array itself and source ids are chosen consecutive: with
   slot positions as sources, the panel stream degenerates into a
   sequential read of da1 (~2 ms).

FORWARD (one Pallas kernel + one small XLA gather):
    buf = P_dis[dis_of_slot]                  # XLA, 1.7 ms
    K2: stream P_drug panels drug-sorted; per group-batch gather the
        drug rows sub-vreg (window 3), MXU-transpose the buf slab to
        feature-major ((E_b,128) x I — per-group transposes measured
        launch-bound, batched ones are free), add, fused MLP
        (relu/dropout/relu/dropout/w3), emit slot-order logits and
        spill pre-activation a1 (bf16) for backward.

Logits are returned in SLOT order — the (E,)-order unscramble is a 1M
scalar gather (6.2 ms measured) that callers avoid by permuting labels
and weights into slot space ONCE at layout build (``slot_labels``);
BCE and AUROC/AUPR are permutation-invariant under the matching
weights, and padding slots carry weight 0.

BACKWARD (two slab kernels + two SpMM calls):
    B1 (drug-sorted grid, no gathers): reread a1 + the slot-order
       cotangent, recompute the MLP, accumulate all weight grads,
       write da1 edge-major.
    d_P_drug = grouped SpMM over scat_drug (sources = slot positions,
       consecutive per drug tile).
    MIRROR (dis-sorted grid): d_P_dis needs da1 summed by dis row, and
       da1 lives drug-sorted — but permuting da1 is the forbidden
       1M-row permute.  Instead RECOMPUTE the per-edge chain in
       dis-sorted order: stream P_dis panels, XLA-gather P_drug rows
       (small table), rebuild a1 and run the backward chain against
       the slot-permuted scalar cotangent, writing da1 in dis-sorted
       slot order; then d_P_dis = grouped SpMM over scat_dis.
       Recompute (≈4 ms) beats the row permute (11.4 ms).

Dropout masks are a murmur-PRF of (seed, edge_id, unit) — the same
stateless-PRF trick the grouped SpMM uses for edge dropout
(augment/masks.py:prf_keep_mask) — so the forward, B1, and the
differently-ordered mirror pass reproduce identical masks with no
stream-alignment coupling.

Measured (1 chip, 100k x 100k nodes, 1M candidates, H1=128, bf16,
dropout 0.3, amortised chained dispatch): see docs/kernels.md §8 and
scripts/bench_scale_decoder.py.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dream_gnn_tpu.graph.grouped import (GROUPS_PER_CHUNK, LEAD, NSLOTS,
                                         SUB, GroupedCoo,
                                         grouped_from_arrays, p0_bits_for)
from dream_gnn_tpu.kernels.pallas_spmm_gather import _spmm_gather_raw

INTERPRET = False

# Edge slots per chunk of a stream layout (16 groups of 128).
STREAM_TILE = GROUPS_PER_CHUNK * SUB
# Groups per MLP batch in K2/B1/mirror (feature planes are
# H1 x gb*128).
DEC_GROUP_BATCH = 8
# Sorted-run window: 128 consecutive single-axis-sorted edges span
# ~E/N*128 ~ 13 rows at the scale config — window 2 plus margin.
STREAM_WINDOW = 3
STREAM_SPAN = 16
_SUB_SHIFT = SUB.bit_length() - 1


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ScaleDecoderLayout:
    """Host-prebuilt layouts for one candidate set (static per fold,
    like the reference's dec graph — data_loader.py:492-509).

    ``fwd``: drug-sorted stream layout (slots = forward edge order).
    ``mirror``: dis-sorted stream layout (slots of the backward
    recompute pass).  ``scat_drug`` / ``scat_dis``: slot-position ->
    node-row scatter layouts for the table gradients.  ``dis_of_slot``
    / ``drug_of_mslot``: node row per slot for the XLA small-table
    gathers.  ``gout_perm``: mirror slot -> forward slot (index
    ``n_pos`` = padding, pointing at an appended zero).  ``inv_slot``:
    physical candidate -> forward slot (eval-only unscramble).
    """

    fwd: GroupedCoo
    mirror: GroupedCoo
    scat_drug: GroupedCoo
    scat_dis: GroupedCoo
    dis_of_slot: jnp.ndarray      # (n_pos,) int32
    drug_of_mslot: jnp.ndarray    # (n_mpos,) int32
    gout_perm: jnp.ndarray        # (n_mpos,) int32
    inv_slot: jnp.ndarray         # (E,) int32
    n_drug: int = dataclasses.field(metadata=dict(static=True))
    n_dis: int = dataclasses.field(metadata=dict(static=True))
    # Round-5 sequential-slab scatter layouts (pallas_seq_scatter.py):
    # the phase probe measured the grouped scatters' XLA input
    # relayout — (1M, 128) -> packed transposed — at 4.11 ms ALONE;
    # the node-sorted streams need no gather, so these consume da1
    # edge-major as emitted.  None on per-shard layouts built for the
    # SPMD stacker (it pads/stacks the grouped fields; the grouped
    # fallback keeps gradient parity there).
    seq_drug: object = None
    seq_dis: object = None

    @property
    def n_pos(self) -> int:
        return int(np.prod(self.fwd.val.shape))

    @property
    def n_mpos(self) -> int:
        return int(np.prod(self.mirror.val.shape))

    @property
    def n_edges(self) -> int:
        return int(self.inv_slot.shape[0])

    def slot_labels(self, labels):
        """Permute per-candidate labels into forward slot order and
        return (slot_labels, slot_weights); padding slots get weight
        0.  Static per fold — call once at setup, not per step."""
        lab = jnp.concatenate([jnp.asarray(labels, jnp.float32),
                               jnp.zeros((1,), jnp.float32)])
        return lab[self.fwd.edge_id.reshape(-1)], self.fwd.val.reshape(-1)


def _stream_layout(node_ids, n_nodes: int, e: int,
                   rank_pad: int | None = None):
    """Sorted-stream layout: edges ranked by ``node_ids`` order, dst =
    rank with ONE giant dst tile (no chunk quantisation), src = node
    row (window-confined because ranks walk rows monotonically).
    ``edge_id`` is remapped from rank to PHYSICAL candidate index so
    downstream consumers never see the sort order.  ``rank_pad``
    overrides the rank-space size (>= e) so layouts built on
    different-length candidate chunks share identical static
    n_dst/tile_dst — required for leaf-wise stacking across shards
    (sharding/scale_decoder_spmd.py)."""
    order = np.argsort(node_ids, kind="stable")
    tile = -(-(rank_pad or e) // SUB) * SUB
    g = grouped_from_arrays(node_ids[order],
                            np.arange(e, dtype=np.int64),
                            np.ones(e, np.float32), n_nodes,
                            rank_pad or e,
                            span=STREAM_SPAN, window=STREAM_WINDOW,
                            tile_dst=tile)
    eid = np.asarray(g.edge_id)          # ranks; e marks padding
    phys = np.where(eid < e, order[np.minimum(eid, e - 1)],
                    e).astype(np.int32)
    g = dataclasses.replace(g, edge_id=jnp.asarray(phys))
    return g


def build_scale_decoder_layout(dec_src, dec_dst, n_drug: int,
                               n_dis: int,
                               rank_pad: int | None = None,
                               build_seq: bool = True,
                               ) -> ScaleDecoderLayout:
    """Build stream + gradient-scatter layouts for a candidate list
    (host-side, static per fold).  ``rank_pad``: see
    ``_stream_layout`` — pass the common chunk size when building
    per-shard layouts for the SPMD wrapper.  ``build_seq=False`` skips
    the sequential-slab scatter layouts (the SPMD stacker discards
    them — it pads/stacks the grouped fields — so per-shard builds
    should not pay for them)."""
    dec_src = np.asarray(dec_src, np.int64)
    dec_dst = np.asarray(dec_dst, np.int64)
    e = len(dec_src)
    ones = np.ones(e, np.float32)

    fwd = _stream_layout(dec_src, n_drug, e, rank_pad)   # drug-sorted
    mirror = _stream_layout(dec_dst, n_dis, e, rank_pad)  # dis-sorted

    def slot_of_edge(g):
        flat = np.asarray(g.edge_id).reshape(-1)    # physical ids
        live = flat < e
        slot = np.zeros(e, np.int64)
        slot[flat[live]] = np.nonzero(live)[0]
        return slot, live, flat

    slot2, live2, flat2 = slot_of_edge(fwd)
    _, livem, flatm = slot_of_edge(mirror)

    n_pos = flat2.shape[0]
    n_mpos = flatm.shape[0]
    dis_of_slot = np.where(live2, dec_dst[np.minimum(flat2, e - 1)], 0)
    drug_of_mslot = np.where(livem, dec_src[np.minimum(flatm, e - 1)], 0)
    gout_perm = np.where(livem, slot2[np.minimum(flatm, e - 1)], n_pos)

    # Table-gradient scatter layouts: src = slot positions (consecutive
    # per node tile because each stream is sorted by that node), dst =
    # node rows.  The SpMM "panel stream" over da1 is then sequential.
    scat_drug = grouped_from_arrays(
        np.arange(n_pos, dtype=np.int64)[live2],
        dec_src[flat2[live2]], ones, n_pos, n_drug,
        span=STREAM_SPAN, window=STREAM_WINDOW)
    scat_dis = grouped_from_arrays(
        np.arange(n_mpos, dtype=np.int64)[livem],
        dec_dst[flatm[livem]], ones, n_mpos, n_dis,
        span=STREAM_SPAN, window=STREAM_WINDOW)

    seq_drug = seq_dis = None
    if build_seq:
        from dream_gnn_tpu.kernels.pallas_seq_scatter import \
            build_seq_scatter

        seq_drug = build_seq_scatter(
            np.where(live2, dec_src[np.minimum(flat2, e - 1)], 0),
            live2, np.ones(n_pos, np.float32), n_drug)
        seq_dis = build_seq_scatter(
            np.where(livem, dec_dst[np.minimum(flatm, e - 1)], 0),
            livem, np.ones(n_mpos, np.float32), n_dis)

    return ScaleDecoderLayout(
        fwd=fwd, mirror=mirror, scat_drug=scat_drug, scat_dis=scat_dis,
        dis_of_slot=jnp.asarray(dis_of_slot, jnp.int32),
        drug_of_mslot=jnp.asarray(drug_of_mslot, jnp.int32),
        gout_perm=jnp.asarray(gout_perm, jnp.int32),
        inv_slot=jnp.asarray(slot2, jnp.int32),
        n_drug=n_drug, n_dis=n_dis,
        seq_drug=seq_drug, seq_dis=seq_dis)


# ---------------------------------------------------------------------------
# Shared kernel pieces


def _panel_schedule(meta_ref, trans_sb_ref, xt_hbm, panels, sems, i, gid,
                    meta, span, shift, emit_prologue: bool):
    """Issue/wait the superblock panel DMAs for one group — identical
    protocol to kernels/pallas_spmm_gather.py (see its module doc).
    ``emit_prologue`` is static: only the grid's very first group
    anchors the LEAD-ahead DMA prologue."""
    def panel_dma(sl, sb):
        return pltpu.make_async_copy(
            xt_hbm.at[pl.ds(sb * span, span)],
            panels.at[sl], sems.at[sl])

    tid = meta >> shift
    sl = tid & (NSLOTS - 1)

    if emit_prologue:
        @pl.when(i == 0)
        def _prologue():
            for k in range(LEAD):
                sbk = trans_sb_ref[k]

                @pl.when(sbk >= 0)
                def _pstart(sbk=sbk, k=k):
                    panel_dma(k & (NSLOTS - 1), sbk).start()

    prev_tid = meta_ref[jnp.maximum(gid - 1, 0)] >> shift
    boundary = (tid != prev_tid) | (gid == 0)

    @pl.when((meta >= 0) & boundary)
    def _wait(tid=tid, sl=sl):
        sb_next = trans_sb_ref[tid + LEAD]

        @pl.when(sb_next >= 0)
        def _start(sb_next=sb_next, tid=tid):
            panel_dma((tid + LEAD) & (NSLOTS - 1), sb_next).start()

        panel_dma(sl, 0).wait()
    return sl


def _gather_group(panels, sl, lanes, sels, gl, p0, window, pr):
    """Sub-vreg gather of one group's source rows (window select tree —
    same dataflow as the SpMM kernel)."""
    idx = jnp.broadcast_to(lanes[gl:gl + 1], (pr, SUB))
    sel = jnp.broadcast_to(sels[gl:gl + 1], (pr, SUB))
    msgs = None
    for p in range(window):
        panel = panels[sl, p0 + p]
        gp = jnp.take_along_axis(panel, idx, axis=1,
                                 mode="promise_in_bounds")
        msgs = gp if msgs is None else jnp.where(sel == p0 + p, gp, msgs)
    return msgs


def _gather_batch(meta_ref, trans_sb_ref, xt_hbm, panels, sems, i, base,
                  gb, lanes, sels, span, window, shift, p0b):
    """Panel schedule + window gathers for ``gb`` groups; returns the
    packed/raw feature-major message plane plus the batch-live flag."""
    parts = []
    batch_live = jnp.int32(0)
    touch_mask = (1 << window) - 1
    for g in range(gb):
        gid = i * GROUPS_PER_CHUNK + base + g
        meta = meta_ref[gid]
        batch_live |= meta & touch_mask
        sl = _panel_schedule(meta_ref, trans_sb_ref, xt_hbm, panels,
                             sems, i, gid, meta, span, shift,
                             emit_prologue=(base + g == 0))
        p0 = (meta >> window) & ((1 << p0b) - 1) if p0b else 0
        parts.append(_gather_group(panels, sl, lanes, sels, base + g,
                                   p0, window, panels.shape[2]))
    return parts, batch_live


def _unpack(msgs, packed, h1):
    if not packed:
        return msgs
    hi = pltpu.bitcast(msgs & jnp.uint32(0xFFFF0000), jnp.float32)
    lo = pltpu.bitcast(msgs << 16, jnp.float32)
    return jnp.concatenate([hi, lo], axis=0)       # (h1, E_b)


def _eye(dtype):
    """(128, 128) identity for the MXU transposes (H1 == SUB == 128
    is asserted at trace time)."""
    return (jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 1)
            ).astype(dtype)


def _mxu_t_fm_to_em(x, eye, dtype):
    """Feature-major (128, E_b) -> edge-major (E_b, 128) on the MXU:
    dot(X, I) contracting X's feature dim.  ONE rectangular matmul per
    group batch — a per-group (128,128) version of this measured
    dispatch-bound (~2 us/launch x 8k groups ~ 16 ms); batching is the
    same launch-amortisation lever as the SpMM's GROUP_BATCH."""
    return jax.lax.dot_general(
        x.astype(dtype), eye,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _mxu_t_em_to_fm(x, eye, dtype):
    """Edge-major (E_b, 128) -> feature-major (128, E_b): contract the
    identity with x's feature dim."""
    return jax.lax.dot_general(
        eye, x.astype(dtype),
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _prf_masks(eids, h2: int, seed, rate: float):
    """Per-(edge, unit) dropout keep-masks from a murmur-PRF of
    (seed, edge_id, unit) — same finaliser as
    augment/masks.py:prf_keep_mask, extended with a unit axis.  Being
    stateless, the forward, B1 and the differently-ordered mirror pass
    reproduce identical masks (the on-core PRNG cannot: its stream
    depends on draw order).  Returns (m1 (128, E_b), m2 (h2, E_b)),
    inverted-scaled."""
    e_b = eids.shape[0]
    base = (eids.astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
            ^ seed.astype(jnp.uint32))
    unit = jax.lax.broadcasted_iota(jnp.uint32, (SUB + h2, 1), 0)
    x = base[None, :] ^ (unit * jnp.uint32(0x7FEB352D))
    x = (x ^ (x >> 16)) * jnp.uint32(0x85EBCA6B)
    x = (x ^ (x >> 13)) * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    thresh = jnp.uint32(min(max(rate, 0.0), 1.0) * 4294967295.0)
    keep = (x >= thresh).astype(jnp.float32) / (1.0 - rate)
    assert keep.shape == (SUB + h2, e_b)
    return keep[:SUB], keep[SUB:]


def _mlp_fwd(a1, w2_ref, b2_ref, w3_ref, m1, m2, dtype):
    """Feature-major MLP tail: a1 (H1, E_b) -> logits (1, E_b)."""
    h1 = jnp.maximum(a1, 0.0)
    if m1 is not None:
        h1 = h1 * m1
    a2 = jax.lax.dot_general(
        w2_ref[:].astype(dtype), h1.astype(dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b2_ref[:]
    h2 = jnp.maximum(a2, 0.0)
    if m2 is not None:
        h2 = h2 * m2
    logits = jax.lax.dot_general(
        w3_ref[:].astype(dtype), h2.astype(dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)        # (1, E_b)
    return h1, a2, h2, logits


def _mlp_bwd(a1, gout_row, w2_ref, b2_ref, w3_ref, m1, m2, dtype,
             grads=None):
    """Recompute + backward of the MLP tail for one batch.  ``gout_row``
    is (1, E_b); returns da1 (H1, E_b).  When ``grads`` is given as
    (dw2, db2, dw3, db1) refs, accumulates the weight grads too."""
    h1a = jnp.maximum(a1, 0.0)
    h1d = h1a * m1 if m1 is not None else h1a
    a2 = jax.lax.dot_general(
        w2_ref[:].astype(dtype), h1d.astype(dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b2_ref[:]
    h2 = jnp.maximum(a2, 0.0)
    h2d = h2 * m2 if m2 is not None else h2

    dh2 = w3_ref[:] * gout_row                    # (H2, E_b)
    if m2 is not None:
        dh2 = dh2 * m2
    da2 = jnp.where(a2 > 0.0, dh2, 0.0)
    dh1 = jax.lax.dot_general(
        w2_ref[:].astype(dtype), da2.astype(dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)       # (H1, E_b)
    if m1 is not None:
        dh1 = dh1 * m1
    da1 = jnp.where(a1 > 0.0, dh1, 0.0)

    if grads is not None:
        dw2_ref, db2_ref, dw3_ref, db1_ref = grads
        # VPU reduce, not a dot: Mosaic mis-lowers the degenerate N=1
        # matmul with bf16 operands ("vector.broadcast bf16 -> f32").
        dw3_ref[:] += jnp.sum(h2d * gout_row, axis=1, keepdims=True)
        db2_ref[:] += jnp.sum(da2, axis=1, keepdims=True)
        dw2_ref[:] += jax.lax.dot_general(
            h1d.astype(dtype), da2.astype(dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        db1_ref[:] += jnp.sum(da1, axis=1, keepdims=True)
    return da1


# ---------------------------------------------------------------------------
# K2: forward — drug-sorted stream gather + buffer add + MLP


def _k2_kernel(seed_ref, meta_ref, trans_sb_ref, src_ref, eid_ref,
               buf_ref, b1_ref, w2_ref, b2_ref, w3_ref, xt_hbm,
               out_ref, a1_ref, panels, sems, *, rate, train, dtype,
               packed, span, window):
    i = pl.program_id(0)
    p0b = p0_bits_for(span)
    shift = p0b + window
    h1 = b1_ref.shape[0]
    h2 = b2_ref.shape[0]
    use_drop = train and rate > 0.0

    @pl.when(i == 0)
    def _zero_ring():
        panels[...] = jnp.zeros_like(panels)

    ids_s = src_ref[0]
    lanes = ids_s & (SUB - 1)
    sels = ids_s >> _SUB_SHIFT
    gb = DEC_GROUP_BATCH
    eye = _eye(dtype)

    for b in range(GROUPS_PER_CHUNK // gb):
        base = b * gb
        parts, batch_live = _gather_batch(
            meta_ref, trans_sb_ref, xt_hbm, panels, sems, i, base, gb,
            lanes, sels, span, window, shift, p0b)

        @pl.when(batch_live != 0)
        def _compute(base=base, parts=parts):
            e_b = gb * SUB
            msgs = _unpack(jnp.concatenate(parts, axis=1), packed, h1)
            buf_em = buf_ref[0, base:base + gb].reshape(e_b, h1)
            a1 = (msgs + _mxu_t_em_to_fm(buf_em, eye, dtype)
                  + b1_ref[:])
            if train:
                a1_ref[:, base * SUB:(base + gb) * SUB] = \
                    a1.astype(a1_ref.dtype)
            if use_drop:
                m1, m2 = _prf_masks(
                    eid_ref[0, base:base + gb].reshape(e_b), h2,
                    seed_ref[0], rate)
            else:
                m1 = m2 = None
            _, _, _, logits = _mlp_fwd(a1, w2_ref, b2_ref, w3_ref,
                                       m1, m2, dtype)
            out_ref[0, base:base + gb, :] = logits.reshape(gb, SUB)

        @pl.when(batch_live == 0)
        def _zero(base=base):
            # Padding batches must emit FINITE logits: downstream
            # weighted losses compute weight * f(logit) and
            # 0 * NaN = NaN would poison the mean.
            out_ref[0, base:base + gb, :] = jnp.zeros((gb, SUB),
                                                      jnp.float32)


def _k2_call(layout, proj_drug, buf, b1, w2, b2, w3, seed, rate,
             train, dtype):
    g = layout.fwd
    h1 = b1.shape[0]
    h2 = w2.shape[1]
    packed = jnp.dtype(dtype) == jnp.bfloat16 and h1 % 2 == 0
    xt3, pr = _prep_panels(proj_drug, g, packed)
    a1_dtype = jnp.bfloat16 if packed else jnp.float32
    n_pos = layout.n_pos

    # The a1 output exists in both modes to keep one kernel signature;
    # eval mode shrinks it to a single never-written block.
    out_shapes = [
        jax.ShapeDtypeStruct((g.n_chunks, GROUPS_PER_CHUNK, SUB),
                             jnp.float32),
        jax.ShapeDtypeStruct(
            (h1, n_pos if train else STREAM_TILE), a1_dtype),
    ]
    out_specs = [
        pl.BlockSpec((1, GROUPS_PER_CHUNK, SUB),
                     lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((h1, STREAM_TILE),
                     (lambda i, *_: (0, i)) if train
                     else (lambda i, *_: (0, 0)),
                     memory_space=pltpu.VMEM),
    ]
    outs = pl.pallas_call(
        functools.partial(_k2_kernel, rate=rate, train=train,
                          dtype=dtype, packed=packed, span=g.span,
                          window=g.window),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,          # seed, meta, trans_sb
            grid=(g.n_chunks,),
            in_specs=[
                _EDGE_SPEC, _EDGE_SPEC,
                pl.BlockSpec((1, GROUPS_PER_CHUNK, SUB, h1),
                             lambda i, *_: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                _FULL, _FULL, _FULL, _FULL,
                pl.BlockSpec(memory_space=pl.ANY),      # xt3 in HBM
            ],
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((NSLOTS, g.span, pr, SUB),
                           jnp.uint32 if packed else jnp.float32),
                pltpu.SemaphoreType.DMA((NSLOTS,)),
            ],
        ),
        out_shape=out_shapes,
        interpret=INTERPRET,
    )(seed.astype(jnp.int32), g.g_meta, g.trans_sb, g.src_local,
      g.edge_id,
      buf.reshape(g.n_chunks, GROUPS_PER_CHUNK, SUB, h1),
      b1.reshape(h1, 1).astype(jnp.float32), w2, b2.reshape(h2, 1),
      w3.reshape(h2, 1), xt3)
    logits_slots, a1 = outs
    return logits_slots, a1 if train else None


# ---------------------------------------------------------------------------
# B1: MLP backward over a1 slabs (drug-sorted grid; weight grads here)


def _b1_kernel(seed_ref, meta_ref, a1_ref, eid_ref, g_ref, w2_ref,
               b2_ref, w3_ref, da1_ref, dw2_ref, db2_ref, dw3_ref,
               db1_ref, *, rate, train, dtype, window):
    i = pl.program_id(0)
    use_drop = train and rate > 0.0
    h1 = a1_ref.shape[0]
    h2 = b2_ref.shape[0]

    @pl.when(i == 0)
    def _init():
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)
        dw3_ref[:] = jnp.zeros_like(dw3_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)

    gb = DEC_GROUP_BATCH
    touch_mask = (1 << window) - 1
    eye = _eye(dtype)
    for b in range(GROUPS_PER_CHUNK // gb):
        base = b * gb
        batch_live = jnp.int32(0)
        for g in range(gb):
            batch_live |= meta_ref[i * GROUPS_PER_CHUNK + base
                                   + g] & touch_mask

        @pl.when(batch_live != 0)
        def _compute(base=base):
            e_b = gb * SUB
            cols = pl.ds(base * SUB, e_b)
            a1 = a1_ref[:, cols].astype(jnp.float32)
            if use_drop:
                m1, m2 = _prf_masks(
                    eid_ref[0, base:base + gb].reshape(e_b), h2,
                    seed_ref[0], rate)
            else:
                m1 = m2 = None
            g_row = g_ref[0, base:base + gb, :].reshape(1, e_b)
            da1 = _mlp_bwd(a1, g_row, w2_ref, b2_ref, w3_ref, m1, m2,
                           dtype,
                           grads=(dw2_ref, db2_ref, dw3_ref, db1_ref))
            da1_ref[0, base:base + gb] = _mxu_t_fm_to_em(
                da1, eye, dtype).reshape(gb, SUB, h1).astype(
                da1_ref.dtype)

        @pl.when(batch_live == 0)
        def _zero(base=base):
            # Padding batches wrote no forward a1; their da1 must be
            # hard zero (the scatter SpMM's val=0 only nullifies
            # finite garbage).
            da1_ref[0, base:base + gb] = jnp.zeros(
                (gb, SUB, h1), da1_ref.dtype)


def _b1_call(layout: ScaleDecoderLayout, a1, gout, w2, b2, w3, seed,
             rate, train, dtype):
    """Backward pass 1: da1 (edge-major, fwd slots) + weight grads.
    ``gout`` is the SLOT-order logit cotangent — no gather needed."""
    g = layout.fwd
    h1 = a1.shape[0]
    h2 = w2.shape[1]
    g_slots = gout.reshape(g.n_chunks, GROUPS_PER_CHUNK, SUB)

    outs = pl.pallas_call(
        functools.partial(_b1_kernel, rate=rate, train=train,
                          dtype=dtype, window=g.window),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,              # seed, meta
            grid=(g.n_chunks,),
            in_specs=[
                pl.BlockSpec((h1, STREAM_TILE), lambda i, *_: (0, i),
                             memory_space=pltpu.VMEM),
                _EDGE_SPEC, _EDGE_SPEC,
                _FULL, _FULL, _FULL,
            ],
            out_specs=[
                pl.BlockSpec((1, GROUPS_PER_CHUNK, SUB, h1),
                             lambda i, *_: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                _FULL, _FULL, _FULL, _FULL,
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(
                (g.n_chunks, GROUPS_PER_CHUNK, SUB, h1), a1.dtype),
            jax.ShapeDtypeStruct((h1, h2), jnp.float32),
            jax.ShapeDtypeStruct((h2, 1), jnp.float32),
            jax.ShapeDtypeStruct((h2, 1), jnp.float32),
            jax.ShapeDtypeStruct((h1, 1), jnp.float32),
        ],
        interpret=INTERPRET,
    )(seed.astype(jnp.int32), g.g_meta, a1, g.edge_id, g_slots, w2,
      b2.reshape(h2, 1), w3.reshape(h2, 1))
    da1, dw2, db2, dw3, db1 = outs
    return da1.reshape(layout.n_pos, h1), dw2, db2, dw3, db1


# ---------------------------------------------------------------------------
# Mirror: dis-sorted recompute backward (da1 in dis-slot order)


def _mirror_kernel(seed_ref, meta_ref, trans_sb_ref, src_ref, eid_ref,
                   buf_ref, g_ref, b1_ref, w2_ref, b2_ref, w3_ref,
                   xt_hbm, da1_ref, panels, sems, *, rate, train,
                   dtype, packed, span, window):
    i = pl.program_id(0)
    p0b = p0_bits_for(span)
    shift = p0b + window
    h1 = b1_ref.shape[0]
    h2 = b2_ref.shape[0]
    use_drop = train and rate > 0.0

    @pl.when(i == 0)
    def _zero_ring():
        panels[...] = jnp.zeros_like(panels)

    ids_s = src_ref[0]
    lanes = ids_s & (SUB - 1)
    sels = ids_s >> _SUB_SHIFT
    gb = DEC_GROUP_BATCH
    eye = _eye(dtype)

    for b in range(GROUPS_PER_CHUNK // gb):
        base = b * gb
        parts, batch_live = _gather_batch(
            meta_ref, trans_sb_ref, xt_hbm, panels, sems, i, base, gb,
            lanes, sels, span, window, shift, p0b)

        @pl.when(batch_live != 0)
        def _compute(base=base, parts=parts):
            e_b = gb * SUB
            msgs = _unpack(jnp.concatenate(parts, axis=1), packed, h1)
            buf_em = buf_ref[0, base:base + gb].reshape(e_b, h1)
            a1 = (msgs + _mxu_t_em_to_fm(buf_em, eye, dtype)
                  + b1_ref[:])
            if use_drop:
                m1, m2 = _prf_masks(
                    eid_ref[0, base:base + gb].reshape(e_b), h2,
                    seed_ref[0], rate)
            else:
                m1 = m2 = None
            g_row = g_ref[0, base:base + gb, :].reshape(1, e_b)
            da1 = _mlp_bwd(a1, g_row, w2_ref, b2_ref, w3_ref, m1, m2,
                           dtype)
            da1_ref[0, base:base + gb] = _mxu_t_fm_to_em(
                da1, eye, dtype).reshape(gb, SUB, h1).astype(
                da1_ref.dtype)

        @pl.when(batch_live == 0)
        def _zero(base=base):
            da1_ref[0, base:base + gb] = jnp.zeros(
                (gb, SUB, h1), da1_ref.dtype)


def _mirror_call(layout: ScaleDecoderLayout, proj_dis, buf, gout_m,
                 b1, w2, b2, w3, seed, rate, train, dtype):
    """Backward pass 2: recompute a1 in dis-sorted order (P_dis panels
    stream, P_drug rows arrive XLA-gathered edge-major in ``buf``) and
    emit da1 in mirror-slot order for the d_P_dis scatter."""
    g = layout.mirror
    h1 = b1.shape[0]
    h2 = w2.shape[1]
    packed = jnp.dtype(dtype) == jnp.bfloat16 and h1 % 2 == 0
    xt3, pr = _prep_panels(proj_dis, g, packed)
    da1_dtype = jnp.bfloat16 if packed else jnp.float32

    da1 = pl.pallas_call(
        functools.partial(_mirror_kernel, rate=rate, train=train,
                          dtype=dtype, packed=packed, span=g.span,
                          window=g.window),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,          # seed, meta, trans_sb
            grid=(g.n_chunks,),
            in_specs=[
                _EDGE_SPEC, _EDGE_SPEC,
                pl.BlockSpec((1, GROUPS_PER_CHUNK, SUB, h1),
                             lambda i, *_: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, GROUPS_PER_CHUNK, SUB),
                             lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                _FULL, _FULL, _FULL, _FULL,
                pl.BlockSpec(memory_space=pl.ANY),      # xt3 in HBM
            ],
            out_specs=pl.BlockSpec(
                (1, GROUPS_PER_CHUNK, SUB, h1),
                lambda i, *_: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((NSLOTS, g.span, pr, SUB),
                           jnp.uint32 if packed else jnp.float32),
                pltpu.SemaphoreType.DMA((NSLOTS,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(
            (g.n_chunks, GROUPS_PER_CHUNK, SUB, h1), da1_dtype),
        interpret=INTERPRET,
    )(seed.astype(jnp.int32), g.g_meta, g.trans_sb, g.src_local,
      g.edge_id,
      buf.reshape(g.n_chunks, GROUPS_PER_CHUNK, SUB, h1),
      gout_m.reshape(g.n_chunks, GROUPS_PER_CHUNK, SUB),
      b1.reshape(h1, 1).astype(jnp.float32), w2, b2.reshape(h2, 1),
      w3.reshape(h2, 1), xt3)
    return da1.reshape(layout.n_mpos, h1)


# ---------------------------------------------------------------------------
# Orchestration


def _prep_panels(proj, g: GroupedCoo, packed):
    """Pad + transpose (+ bf16-pack) a projection table into the
    (n_subtiles, pr, SUB) panel form the DMA schedule slices."""
    h1 = proj.shape[1]
    x_pad = proj if proj.shape[0] == g.n_src_pad else jnp.pad(
        proj, ((0, g.n_src_pad - proj.shape[0]), (0, 0)))
    xt = x_pad.T.astype(jnp.float32)
    if packed:
        half = jax.lax.bitcast_convert_type(
            xt.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
        xt = (half[: h1 // 2] << 16) | half[h1 // 2:]
    pr = h1 // 2 if packed else h1
    return xt.reshape(pr, g.n_src_pad // SUB, SUB).transpose(1, 0, 2), pr


_EDGE_SPEC = pl.BlockSpec((1, GROUPS_PER_CHUNK, SUB),
                          lambda i, *_: (i, 0, 0),
                          memory_space=pltpu.VMEM)
_FULL = pl.BlockSpec(memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def scale_decoder(rate, train, dtype, layout: ScaleDecoderLayout,
                  proj_drug, proj_dis, b1, w2, b2, w3, b3, seed):
    """Fused per-edge decoder at framework scale.  Returns logits in
    FORWARD SLOT order, shape (layout.n_pos,) — pair with
    ``layout.slot_labels(labels)`` for loss/metric weights (BCE and
    AUROC/AUPR are permutation-invariant; the (E,)-order unscramble is
    a measured 6 ms scalar gather, eval-only via ``layout.inv_slot``).
    """
    out, _ = _scale_decoder_fwd(rate, train, dtype, layout, proj_drug,
                                proj_dis, b1, w2, b2, w3, b3, seed)
    return out


def _scale_decoder_fwd(rate, train, dtype, layout, proj_drug, proj_dis,
                       b1, w2, b2, w3, b3, seed):
    if b1.shape[0] != SUB:
        raise ValueError(
            f"scale decoder requires H1=128 (one vreg of lanes for the "
            f"MXU transposes); got {b1.shape[0]}")
    bufd = jnp.bfloat16 if jnp.dtype(dtype) == jnp.bfloat16 \
        else jnp.float32
    buf = proj_dis.astype(bufd)[layout.dis_of_slot]    # small gather
    logits_slots, a1 = _k2_call(layout, proj_drug, buf, b1, w2, b2,
                                w3, seed, rate, train, dtype)
    logits = logits_slots.reshape(-1) + b3[0]
    res = (layout, a1, proj_drug, proj_dis, b1, w2, b2, w3, seed)
    return logits, res


def _scale_decoder_bwd(rate, train, dtype, res, gout):
    layout, a1, proj_drug, proj_dis, b1, w2, b2, w3, seed = res
    gout = gout.astype(jnp.float32)
    da1, dw2, db2, dw3, db1 = _b1_call(
        layout, a1, gout, w2, b2, w3, seed, rate, train, dtype)
    if layout.seq_drug is not None:
        from dream_gnn_tpu.kernels.pallas_seq_scatter import seq_scatter
        d_pd = seq_scatter(layout.seq_drug, da1, dtype=dtype)
    else:
        d_pd = _spmm_gather_raw(layout.scat_drug, da1,
                                dtype=dtype)[: layout.n_drug]

    # Mirror pass: recompute da1 in dis-sorted order (see module doc —
    # recompute beats the forbidden 1M-row permute), then scatter.
    bufd = da1.dtype
    buf_pd = proj_drug.astype(bufd)[layout.drug_of_mslot]
    gout_m = jnp.concatenate(
        [gout, jnp.zeros((1,), jnp.float32)])[layout.gout_perm]
    da1_m = _mirror_call(layout, proj_dis, buf_pd, gout_m, b1, w2, b2,
                         w3, seed, rate, train, dtype)
    if layout.seq_dis is not None:
        from dream_gnn_tpu.kernels.pallas_seq_scatter import seq_scatter
        d_pv = seq_scatter(layout.seq_dis, da1_m, dtype=dtype)
    else:
        d_pv = _spmm_gather_raw(layout.scat_dis, da1_m,
                                dtype=dtype)[: layout.n_dis]

    db3 = jnp.sum(gout, keepdims=True)

    def _zero_cot(x):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return jnp.zeros_like(x)
        return np.zeros(x.shape, jax.dtypes.float0)

    return (jax.tree.map(_zero_cot, layout), d_pd, d_pv, db1[:, 0],
            dw2, db2[:, 0], dw3[:, 0], db3,
            np.zeros((1,), jax.dtypes.float0))


scale_decoder.defvjp(_scale_decoder_fwd, _scale_decoder_bwd)


def decoder_apply_scale(params, layout: ScaleDecoderLayout,
                        drug_feat, dis_feat, *, dropout_rate: float,
                        train: bool = False, key=None,
                        dtype=jnp.bfloat16):
    """Drop-in decoder for node counts beyond the VMEM fused kernel's
    MAX_ONEHOT_NODES.  Returns SLOT-order logits (layout.n_pos,) —
    see ``scale_decoder``.  The node projections run in XLA (w1 /
    feature grads come free via the chain rule); everything per-edge
    runs in the Pallas pipeline above."""
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
    return scale_decoder(dropout_rate, train, dtype, layout, proj_drug,
                         proj_dis, params["b1"], params["w2"],
                         params["b2"], params["w3"][:, 0], params["b3"],
                         seed)

"""Fused dense-grid MLP decoder — Pallas TPU kernel.

The per-edge fused decoder (kernels/pallas_decoder.py) gathers node
rows with one-hot MXU matmuls costing O(N) MACs per edge — at lrssl
scale (N=763) that one-hot work is the single largest FLOP block of
the whole training step.  But the reference's candidate edge set is
~90% of the full drug x disease grid (rating-0 pairs are candidates,
data_loader.py:423-446), so this kernel decodes the WHOLE grid
instead: a (8 drugs x 128 diseases) output tile needs only a direct
slice of each projection table and the per-cell MLP

    h1 = relu(proj_drug[i] + proj_dis[j] + b1)       # outer sum
    h2 = relu(dropout(h1) @ w2 + b2)                 # MXU
    out[i, j] = dropout(h2) . w3

— no gathers at all, ~20x fewer FLOPs per scored pair than the
one-hot path.  Out-of-fold cells are masked by the caller's loss /
metric weights (their cotangent is zero, so they contribute no
gradient; padding rows/cols beyond N likewise).

Forward grid is (drug_tiles, dis_tiles) writing a (gi, Nv_pad, 8)
column-major tile layout (lane-friendly (128, 1) stores, like the edge
kernel; Mosaic requires the trailing block dim to divide 128 or equal
the array dim); one cheap XLA transpose outside undoes it.  The backward kernel iterates (dis_tiles, drug_tiles) so the
disease-projection gradient tile has consecutive visits (accumulated
in VMEM, initialised at i==0); the drug-projection gradient is written
as per-dis-tile partial slabs (each block visited exactly once) and
summed in XLA.  Dropout is rematerialised from the on-core PRNG
seeded per (drug_tile, dis_tile) — iteration-order independent, so
forward and backward draw identical masks.

Replaces: reference MLPDecoder + DGL apply_edges (layers.py:341-379,
364) for reference-scale (dense-mask) datasets.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dream_gnn_tpu.kernels import pallas_decoder as pd

_LANE = 128          # disease cells per sub-row (vreg lanes)
_ROWS = 32           # drug rows per tile
# MEASUREMENT-ONLY knob (scripts/probe_grid_tiles.py): cast the
# dropout-scaled activations + masks to bf16 inside the tile so
# bigger tiles fit the backward's VMEM.  Default off — numerics of
# the production kernel are unchanged.
_HALF_INTERMEDIATES = False


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _tile_forward(asm, pd_t, pv_t, b1, w2, b2, rate, train, dtype):
    """The WHOLE (ROWS x 128 dis) tile as one (_ROWS*128, H1) batch —
    row r's cells occupy rows [r*128, (r+1)*128).  PRNG must already
    be seeded.  ``asm`` is a (_ROWS*128, H1) f32 VMEM scratch used to
    assemble the outer sum (Mosaic rejects a sublane concat of the
    offset-shifted row broadcasts: "result/input offset mismatch on
    non-concat dimension"; static-offset stores assemble the same
    batch).  Returns (a1, h1d, m1, a2, h2d, m2).

    Batching the _ROWS drug rows into a single matmul M-dim (instead
    of a per-row loop of (128, H1) x (H1, H2) matmuls) cuts the
    per-tile MXU dispatch count 8x and draws the dropout masks in one
    PRNG call; the per-tile VPU work is unchanged.  Measured on the
    lrssl fold-parallel protocol step: see docs/kernels.md §7."""
    use_drop = train and rate > 0.0
    for r in range(_ROWS):
        asm[r * _LANE:(r + 1) * _LANE, :] = pv_t + pd_t[r:r + 1, :]
    a1 = asm[...] + b1
    h1 = jnp.maximum(a1, 0.0)                 # (_ROWS*128, H1)
    # NOTE (round-4 negative result): deriving both masks from one
    # half-width PRNG draw via hi/lo 16-bit splits measured WORSE
    # (24.3 vs 18.4 ms/protocol-step) — the lane-dimension concats
    # reassembling full-width masks cost more in Mosaic relayouts
    # than the halved prng_random_bits saves.
    m1 = pd._dropout_mask(h1.shape, rate) if use_drop else None
    h1d = h1 * m1 if use_drop else h1
    if _HALF_INTERMEDIATES:
        h1d = h1d.astype(jnp.bfloat16)
        m1 = m1.astype(jnp.bfloat16) if use_drop else None
    a2 = jnp.dot(h1d.astype(dtype), w2.astype(dtype),
                 preferred_element_type=jnp.float32) + b2
    h2 = jnp.maximum(a2, 0.0)
    m2 = pd._dropout_mask(h2.shape, rate) if use_drop else None
    h2d = h2 * m2 if use_drop else h2
    if _HALF_INTERMEDIATES:
        h2d = h2d.astype(jnp.bfloat16)
        m2 = m2.astype(jnp.bfloat16) if use_drop else None
    return a1, h1d, m1, a2, h2d, m2


def _fwd_kernel(seed_ref, pd_ref, pv_ref, b1_ref, w2_ref, b2_ref, w3_ref,
                out_ref, asm, *, gj: int, rate: float, train: bool,
                dtype):
    i = pl.program_id(0)
    j = pl.program_id(1)
    if train and rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + i * gj + j)
    pd_t = pd_ref[:].astype(jnp.float32)
    pv_t = pv_ref[:].astype(jnp.float32)
    b1 = b1_ref[:]
    w2 = w2_ref[:]
    b2 = b2_ref[:]
    w3 = w3_ref[:]
    _, _, _, _, h2d, _ = _tile_forward(asm, pd_t, pv_t, b1, w2, b2,
                                       rate, train, dtype)
    s = jnp.sum(h2d * w3, axis=1, keepdims=True)   # (_ROWS*128, 1)
    for r in range(_ROWS):
        out_ref[0, :, r:r + 1] = s[r * _LANE:(r + 1) * _LANE]


def _bwd_kernel(seed_ref, pd_ref, pv_ref, b1_ref, w2_ref, b2_ref, w3_ref,
                g_ref, dpv_ref, dpd_ref, db1_ref, dw2_ref, db2_ref,
                dw3_ref, asm, gasm, *, gj: int, rate: float, train: bool,
                dtype):
    # Backward grid is (j, i): dis-tile outer so dpv has consecutive
    # visits; dpd is a per-j partial slab (visited once per (j, i)).
    j = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init_dpv():
        dpv_ref[...] = jnp.zeros_like(dpv_ref)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _init_weights():
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)
        dw3_ref[...] = jnp.zeros_like(dw3_ref)

    use_drop = train and rate > 0.0
    if use_drop:
        # Same seed formula as the forward — iteration-order invariant.
        pltpu.prng_seed(seed_ref[0] + i * gj + j)
    pd_t = pd_ref[:].astype(jnp.float32)
    pv_t = pv_ref[:].astype(jnp.float32)
    b1 = b1_ref[:]
    w2 = w2_ref[:]
    b2 = b2_ref[:]
    w3 = w3_ref[:]

    a1, h1d, m1, a2, h2d, m2 = _tile_forward(asm, pd_t, pv_t, b1, w2, b2,
                                             rate, train, dtype)
    for r in range(_ROWS):
        gasm[r * _LANE:(r + 1) * _LANE, :] = g_ref[0, :, r:r + 1]
    g = gasm[...]                                      # (_ROWS*128, 1)
    dw3_ref[:] += jnp.dot(g.T.astype(dtype), h2d.astype(dtype),
                          preferred_element_type=jnp.float32)
    dh2 = g * w3
    if use_drop:
        dh2 = dh2 * m2
    da2 = jnp.where(a2 > 0.0, dh2, 0.0)
    dw2_ref[:] += jnp.dot(h1d.astype(dtype).T, da2.astype(dtype),
                          preferred_element_type=jnp.float32)
    db2_ref[:] += jnp.sum(da2, axis=0, keepdims=True)
    dh1 = jnp.dot(da2.astype(dtype), w2.astype(dtype).T,
                  preferred_element_type=jnp.float32)
    if use_drop:
        dh1 = dh1 * m1
    da1 = jnp.where(a1 > 0.0, dh1, 0.0)
    db1_ref[:] += jnp.sum(da1, axis=0, keepdims=True)
    acc = da1[0:_LANE]
    for r in range(1, _ROWS):
        acc = acc + da1[r * _LANE:(r + 1) * _LANE]
    dpv_ref[:] += acc
    for r in range(_ROWS):
        dpd_ref[0, r:r + 1, :] = jnp.sum(
            da1[r * _LANE:(r + 1) * _LANE], axis=0, keepdims=True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def fused_grid_decoder(proj_drug, proj_dis, b1, w2, b2, w3, seed,
                       rate: float, train: bool, dtype=jnp.bfloat16):
    """Fused grid decoder MLP (bias b3 added by the caller).

    Args:
      proj_drug: (Nd, H1) fp32; proj_dis: (Nv, H1) fp32 (H1 % 128 == 0
        recommended); b1: (H1,); w2: (H1, H2); b2: (H2,); w3: (H2,).
      seed: (1,) int32 traced scalar — vary per step for fresh dropout.
    Returns logits (Nd, Nv) fp32 (WITHOUT b3).
    """
    out, _ = _fwd_impl(proj_drug, proj_dis, b1, w2, b2, w3, seed,
                       rate, train, dtype)
    return out


def _pad_rows(x, n):
    return jnp.pad(x, ((0, n - x.shape[0]), (0, 0)))


def _fwd_impl(proj_drug, proj_dis, b1, w2, b2, w3, seed, rate, train,
              dtype):
    nd, h1 = proj_drug.shape
    nv = proj_dis.shape[0]
    nd_p = _round_up(nd, _ROWS)
    nv_p = _round_up(nv, _LANE)
    gi, gj = nd_p // _ROWS, nv_p // _LANE

    out_t = pl.pallas_call(
        functools.partial(_fwd_kernel, gj=gj, rate=rate, train=train,
                          dtype=dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(gi, gj),
            in_specs=[
                pl.BlockSpec((_ROWS, h1), lambda i, j, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_LANE, h1), lambda i, j, *_: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, h1), lambda i, j, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(w2.shape, lambda i, j, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, w2.shape[1]), lambda i, j, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, w2.shape[1]), lambda i, j, *_: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, _LANE, _ROWS),
                                   lambda i, j, *_: (i, j, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((_ROWS * _LANE, h1), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((gi, nv_p, _ROWS), jnp.float32),
        interpret=pd.INTERPRET,
    )(seed.astype(jnp.int32), _pad_rows(proj_drug, nd_p),
      _pad_rows(proj_dis, nv_p), b1[None, :], w2, b2[None, :], w3[None, :])
    residuals = (proj_drug, proj_dis, b1, w2, b2, w3, seed)
    # out_t[i, v, r] = cell (drug i*8+r, dis v).
    out = out_t.transpose(0, 2, 1).reshape(nd_p, nv_p)
    return out[:nd, :nv], residuals


def _fused_grid_decoder_fwd(proj_drug, proj_dis, b1, w2, b2, w3, seed,
                            rate, train, dtype):
    return _fwd_impl(proj_drug, proj_dis, b1, w2, b2, w3, seed, rate,
                     train, dtype)


def _fused_grid_decoder_bwd(rate, train, dtype, res, g):
    proj_drug, proj_dis, b1, w2, b2, w3, seed = res
    nd, h1 = proj_drug.shape
    nv = proj_dis.shape[0]
    nd_p = _round_up(nd, _ROWS)
    nv_p = _round_up(nv, _LANE)
    gi, gj = nd_p // _ROWS, nv_p // _LANE
    h2 = w2.shape[1]
    g_t = jnp.pad(g, ((0, nd_p - nd), (0, nv_p - nv))) \
        .reshape(gi, _ROWS, nv_p).transpose(0, 2, 1)   # (gi, nv_p, 8)

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, gj=gj, rate=rate, train=train,
                          dtype=dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(gj, gi),
            in_specs=[
                pl.BlockSpec((_ROWS, h1), lambda j, i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_LANE, h1), lambda j, i, *_: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, h1), lambda j, i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(w2.shape, lambda j, i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, h2), lambda j, i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, h2), lambda j, i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, _LANE, _ROWS), lambda j, i, *_: (i, j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((_LANE, h1), lambda j, i, *_: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, _ROWS, h1), lambda j, i, *_: (j, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, h1), lambda j, i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(w2.shape, lambda j, i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, h2), lambda j, i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, h2), lambda j, i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((_ROWS * _LANE, h1), jnp.float32),
                pltpu.VMEM((_ROWS * _LANE, 1), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((nv_p, h1), jnp.float32),
            jax.ShapeDtypeStruct((gj, nd_p, h1), jnp.float32),
            jax.ShapeDtypeStruct((1, h1), jnp.float32),
            jax.ShapeDtypeStruct((h1, h2), jnp.float32),
            jax.ShapeDtypeStruct((1, h2), jnp.float32),
            jax.ShapeDtypeStruct((1, h2), jnp.float32),
        ],
        interpret=pd.INTERPRET,
    )(seed.astype(jnp.int32), _pad_rows(proj_drug, nd_p),
      _pad_rows(proj_dis, nv_p), b1[None, :], w2, b2[None, :],
      w3[None, :], g_t)

    dpv, dpd_part, db1, dw2, db2, dw3 = outs
    dpd = jnp.sum(dpd_part, axis=0)[:nd]
    s0 = np.zeros(seed.shape, jax.dtypes.float0)
    return (dpd, dpv[:nv], db1[0], dw2, db2[0], dw3[0], s0)


fused_grid_decoder.defvjp(_fused_grid_decoder_fwd, _fused_grid_decoder_bwd)


def decoder_apply_grid_fused(params, drug_feat, dis_feat, *,
                             dropout_rate: float, train: bool = False,
                             key: Optional[jax.Array] = None,
                             dtype=jnp.bfloat16):
    """Fused drop-in for nn.decoder.decoder_apply_grid.

    Node projections run in XLA (their w1 gradient is free); the
    per-cell MLP runs in the Pallas kernel.  Returns (Nd, Nv) logits.
    """
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
    logits = fused_grid_decoder(proj_drug, proj_dis, params["b1"],
                                params["w2"], params["b2"],
                                params["w3"][:, 0], seed,
                                dropout_rate, train, dtype)
    return logits + params["b3"][0]


def fused_grid_decoder_spmd2d(mesh, drug_axis, dis_axis, proj_drug,
                              proj_dis, b1, w2, b2, w3, seed,
                              rate: float, train: bool, dtype):
    """2D model-parallel SINGLE-fold grid decode: drug rows ->
    ``drug_axis``, disease rows -> ``dis_axis``.

    The composition piece for the edge-partitioned ring scale path
    (VERDICT r3 #7): the ring shards the encoder graph over one mesh
    axis while the decoder grid is far larger than either node set —
    each device decodes its (Nd/S, Nv/M) block with the unmodified
    kernel.  shard_map's transpose inserts the gradient psums: the
    drug projection is replicated along ``dis_axis`` (-> psum over
    it), the disease projection along ``drug_axis``, and the MLP
    weights along both.  Row dims pad to divisibility; pad cells carry
    zero cotangent.  Dropout offsets the seed per (i, j) shard —
    independent, equally distributed streams.
    """
    from jax.sharding import PartitionSpec as P

    dn = mesh.shape[drug_axis]
    vn = mesh.shape[dis_axis]
    nd, nv = proj_drug.shape[0], proj_dis.shape[0]
    nd_pad = _round_up(nd, dn * _ROWS)
    nv_pad = _round_up(nv, vn * _LANE)
    pd_p = jnp.pad(proj_drug, ((0, nd_pad - nd), (0, 0)))
    pv_p = jnp.pad(proj_dis, ((0, nv_pad - nv), (0, 0)))

    def local(pdl, pvl, b1l, w2l, b2l, w3l, sl):
        sl = sl + (jax.lax.axis_index(drug_axis) * vn
                   + jax.lax.axis_index(dis_axis)).astype(jnp.int32) \
            * jnp.int32(1000003)
        return fused_grid_decoder(pdl, pvl, b1l, w2l, b2l, w3l, sl,
                                  rate, train, dtype)

    logits = jax.shard_map(
        local, mesh=mesh, check_vma=False,
        in_specs=(P(drug_axis, None), P(dis_axis, None), P(None),
                  P(None, None), P(None), P(None), P(None)),
        out_specs=P(drug_axis, dis_axis),
    )(pd_p, pv_p, b1, w2, b2, w3, seed)
    return logits[:nd, :nv]


# ---------------------------------------------------------------------------
# Fold-batched variant: one extra outer grid axis over independent folds
# (per-fold projections, weights, dropout seeds).  Same tile pipeline;
# see kernels/pallas_decoder_batched.py for why vmap cannot express this.
# ---------------------------------------------------------------------------


def _fwd_kernel_b(seed_ref, pd_ref, pv_ref, b1_ref, w2_ref, b2_ref, w3_ref,
                  out_ref, asm, *, gj: int, rate: float, train: bool,
                  dtype):
    f = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    if train and rate > 0.0:
        pltpu.prng_seed(seed_ref[f] + i * gj + j)
    pd_t = pd_ref[0].astype(jnp.float32)
    pv_t = pv_ref[0].astype(jnp.float32)
    b1 = b1_ref[0]
    w2 = w2_ref[0]
    b2 = b2_ref[0]
    w3 = w3_ref[0]
    _, _, _, _, h2d, _ = _tile_forward(asm, pd_t, pv_t, b1, w2, b2,
                                       rate, train, dtype)
    s = jnp.sum(h2d * w3, axis=1, keepdims=True)
    for r in range(_ROWS):
        out_ref[0, 0, :, r:r + 1] = s[r * _LANE:(r + 1) * _LANE]


def _bwd_kernel_b(seed_ref, pd_ref, pv_ref, b1_ref, w2_ref, b2_ref, w3_ref,
                  g_ref, dpv_ref, dpd_ref, db1_ref, dw2_ref, db2_ref,
                  dw3_ref, asm, gasm, *, gj: int, rate: float,
                  train: bool, dtype):
    f = pl.program_id(0)
    j = pl.program_id(1)
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _init_dpv():
        dpv_ref[...] = jnp.zeros_like(dpv_ref)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _init_weights():
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)
        dw3_ref[...] = jnp.zeros_like(dw3_ref)

    use_drop = train and rate > 0.0
    if use_drop:
        pltpu.prng_seed(seed_ref[f] + i * gj + j)
    pd_t = pd_ref[0].astype(jnp.float32)
    pv_t = pv_ref[0].astype(jnp.float32)
    b1 = b1_ref[0]
    w2 = w2_ref[0]
    b2 = b2_ref[0]
    w3 = w3_ref[0]

    a1, h1d, m1, a2, h2d, m2 = _tile_forward(asm, pd_t, pv_t, b1, w2, b2,
                                             rate, train, dtype)
    for r in range(_ROWS):
        gasm[r * _LANE:(r + 1) * _LANE, :] = g_ref[0, 0, :, r:r + 1]
    g = gasm[...]
    dw3_ref[0] += jnp.dot(g.T.astype(dtype), h2d.astype(dtype),
                          preferred_element_type=jnp.float32)
    dh2 = g * w3
    if use_drop:
        dh2 = dh2 * m2
    da2 = jnp.where(a2 > 0.0, dh2, 0.0)
    dw2_ref[0] += jnp.dot(h1d.astype(dtype).T, da2.astype(dtype),
                          preferred_element_type=jnp.float32)
    db2_ref[0] += jnp.sum(da2, axis=0, keepdims=True)
    dh1 = jnp.dot(da2.astype(dtype), w2.astype(dtype).T,
                  preferred_element_type=jnp.float32)
    if use_drop:
        dh1 = dh1 * m1
    da1 = jnp.where(a1 > 0.0, dh1, 0.0)
    db1_ref[0] += jnp.sum(da1, axis=0, keepdims=True)
    acc = da1[0:_LANE]
    for r in range(1, _ROWS):
        acc = acc + da1[r * _LANE:(r + 1) * _LANE]
    dpv_ref[0] += acc
    for r in range(_ROWS):
        dpd_ref[0, 0, r:r + 1, :] = jnp.sum(
            da1[r * _LANE:(r + 1) * _LANE], axis=0, keepdims=True)


def _pad_rows_b(x, n):
    return jnp.pad(x, ((0, 0), (0, n - x.shape[1]), (0, 0)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def fused_grid_decoder_batched(proj_drug, proj_dis, b1, w2, b2, w3, seed,
                               rate: float, train: bool,
                               dtype=jnp.bfloat16):
    """Fold-batched fused grid decoder (leading F axis everywhere).

    proj_drug: (F, Nd, H1); proj_dis: (F, Nv, H1); b1: (F, H1);
    w2: (F, H1, H2); b2: (F, H2); w3: (F, H2); seed: (F,) int32.
    Returns logits (F, Nd, Nv) fp32 (WITHOUT b3).
    """
    out, _ = _fwd_impl_b(proj_drug, proj_dis, b1, w2, b2, w3, seed,
                         rate, train, dtype)
    return out


def _fwd_impl_b(proj_drug, proj_dis, b1, w2, b2, w3, seed, rate, train,
                dtype):
    nf, nd, h1 = proj_drug.shape
    nv = proj_dis.shape[1]
    h2 = w2.shape[2]
    nd_p = _round_up(nd, _ROWS)
    nv_p = _round_up(nv, _LANE)
    gi, gj = nd_p // _ROWS, nv_p // _LANE

    def fold(*shape):
        return pl.BlockSpec((1,) + shape,
                            lambda f, i, j, *_: (f,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    out_t = pl.pallas_call(
        functools.partial(_fwd_kernel_b, gj=gj, rate=rate, train=train,
                          dtype=dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nf, gi, gj),
            in_specs=[
                pl.BlockSpec((1, _ROWS, h1), lambda f, i, j, *_: (f, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, _LANE, h1), lambda f, i, j, *_: (f, j, 0),
                             memory_space=pltpu.VMEM),
                fold(1, h1), fold(h1, h2), fold(1, h2), fold(1, h2),
            ],
            out_specs=pl.BlockSpec((1, 1, _LANE, _ROWS),
                                   lambda f, i, j, *_: (f, i, j, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((_ROWS * _LANE, h1), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((nf, gi, nv_p, _ROWS), jnp.float32),
        interpret=pd.INTERPRET,
    )(seed.astype(jnp.int32), _pad_rows_b(proj_drug, nd_p),
      _pad_rows_b(proj_dis, nv_p), b1[:, None, :], w2, b2[:, None, :],
      w3[:, None, :])
    residuals = (proj_drug, proj_dis, b1, w2, b2, w3, seed)
    out = out_t.transpose(0, 1, 3, 2).reshape(nf, nd_p, nv_p)
    return out[:, :nd, :nv], residuals


def _fused_grid_decoder_b_fwd(proj_drug, proj_dis, b1, w2, b2, w3, seed,
                              rate, train, dtype):
    return _fwd_impl_b(proj_drug, proj_dis, b1, w2, b2, w3, seed, rate,
                       train, dtype)


def _fused_grid_decoder_b_bwd(rate, train, dtype, res, g):
    proj_drug, proj_dis, b1, w2, b2, w3, seed = res
    nf, nd, h1 = proj_drug.shape
    nv = proj_dis.shape[1]
    h2 = w2.shape[2]
    nd_p = _round_up(nd, _ROWS)
    nv_p = _round_up(nv, _LANE)
    gi, gj = nd_p // _ROWS, nv_p // _LANE
    g_t = jnp.pad(g, ((0, 0), (0, nd_p - nd), (0, nv_p - nv))) \
        .reshape(nf, gi, _ROWS, nv_p).transpose(0, 1, 3, 2)

    def fold(*shape):
        return pl.BlockSpec((1,) + shape,
                            lambda f, j, i, *_: (f,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel_b, gj=gj, rate=rate, train=train,
                          dtype=dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nf, gj, gi),
            in_specs=[
                pl.BlockSpec((1, _ROWS, h1), lambda f, j, i, *_: (f, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, _LANE, h1), lambda f, j, i, *_: (f, j, 0),
                             memory_space=pltpu.VMEM),
                fold(1, h1), fold(h1, h2), fold(1, h2), fold(1, h2),
                pl.BlockSpec((1, 1, _LANE, _ROWS),
                             lambda f, j, i, *_: (f, i, j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, _LANE, h1), lambda f, j, i, *_: (f, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, _ROWS, h1),
                             lambda f, j, i, *_: (f, j, i, 0),
                             memory_space=pltpu.VMEM),
                fold(1, h1), fold(h1, h2), fold(1, h2), fold(1, h2),
            ],
            scratch_shapes=[
                pltpu.VMEM((_ROWS * _LANE, h1), jnp.float32),
                pltpu.VMEM((_ROWS * _LANE, 1), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((nf, nv_p, h1), jnp.float32),
            jax.ShapeDtypeStruct((nf, gj, nd_p, h1), jnp.float32),
            jax.ShapeDtypeStruct((nf, 1, h1), jnp.float32),
            jax.ShapeDtypeStruct((nf, h1, h2), jnp.float32),
            jax.ShapeDtypeStruct((nf, 1, h2), jnp.float32),
            jax.ShapeDtypeStruct((nf, 1, h2), jnp.float32),
        ],
        interpret=pd.INTERPRET,
    )(seed.astype(jnp.int32), _pad_rows_b(proj_drug, nd_p),
      _pad_rows_b(proj_dis, nv_p), b1[:, None, :], w2, b2[:, None, :],
      w3[:, None, :], g_t)

    dpv, dpd_part, db1, dw2, db2, dw3 = outs
    dpd = jnp.sum(dpd_part, axis=1)[:, :nd]
    s0 = np.zeros(seed.shape, jax.dtypes.float0)
    return (dpd, dpv[:, :nv], db1[:, 0], dw2, db2[:, 0], dw3[:, 0], s0)


fused_grid_decoder_batched.defvjp(_fused_grid_decoder_b_fwd,
                                  _fused_grid_decoder_b_bwd)


def fused_grid_decoder_batched_spmd(mesh, fold_axis, shard_axis,
                                    proj_drug, proj_dis, b1, w2, b2, w3,
                                    seed, rate: float, train: bool, dtype):
    """SPMD partitioning rule for the fold-batched grid decoder.

    Matches the stacked-fold mesh layout (sharding/partition.py): fold
    axis -> ``fold_axis`` (dp), the disease/node dimension ->
    ``shard_axis`` (mp).  Each device decodes its (F/dp, Nd, Nv/mp)
    grid block with the unmodified kernel; shard_map's transpose
    inserts the psum over ``shard_axis`` for the drug-projection and
    MLP-weight gradients (replicated along the disease shards) while
    the disease-projection gradient stays local.  Fold and disease
    dims are padded to divisibility; pad cells are sliced away (zero
    cotangent -> zero gradient contribution).

    Dropout: each disease shard offsets the per-fold seed by its
    ``shard_axis`` index — independent streams per shard, but a
    different (equally distributed) stream than single-chip.
    """
    from jax.sharding import PartitionSpec as P

    dp_n = mesh.shape[fold_axis]
    mp_n = mesh.shape[shard_axis]
    f, nd, _ = proj_drug.shape
    nv = proj_dis.shape[1]
    f_pad = _round_up(f, dp_n)
    nv_pad = _round_up(nv, mp_n)

    def padf(x):
        return jnp.pad(x, ((0, f_pad - f),) + ((0, 0),) * (x.ndim - 1))

    pv_p = jnp.pad(proj_dis, ((0, f_pad - f), (0, nv_pad - nv), (0, 0)))

    def local(pdl, pvl, b1l, w2l, b2l, w3l, sl):
        sl = sl + jax.lax.axis_index(shard_axis).astype(jnp.int32) \
            * jnp.int32(1000003)
        return fused_grid_decoder_batched(pdl, pvl, b1l, w2l, b2l, w3l,
                                          sl, rate, train, dtype)

    fold = lambda *rest: P(fold_axis, *rest)            # noqa: E731
    # check_vma=False: pallas_call carries no varying-mesh-axes info;
    # gradient psums still come from the in_specs (verified against the
    # XLA decoder in tests/test_decoder_spmd.py).
    logits = jax.shard_map(
        local, mesh=mesh, check_vma=False,
        in_specs=(fold(None, None), fold(shard_axis, None), fold(None),
                  fold(None, None), fold(None), fold(None), fold()),
        out_specs=fold(None, shard_axis),
    )(padf(proj_drug), pv_p, padf(b1), padf(w2), padf(b2), padf(w3),
      padf(seed))
    return logits[:f, :, :nv]


def decoder_apply_grid_fused_batched(params, drug_feat, dis_feat, *,
                                     dropout_rate: float,
                                     train: bool = False,
                                     key: Optional[jax.Array] = None,
                                     dtype=jnp.bfloat16, mesh=None,
                                     fold_axis: str = "dp",
                                     shard_axis: str = "mp"):
    """Fold-batched fused grid decode; params leaves, features (F,N,d),
    and key (F,) carry a leading fold axis.  Returns (F, Nd, Nv).

    With ``mesh`` the kernel runs under its shard_map partitioning
    rule (fused_grid_decoder_batched_spmd) instead of falling back to
    the XLA decoder on the multi-chip path."""
    d = drug_feat.shape[2]
    w1 = params["w1"]
    proj_drug = jnp.einsum("fnd,fdh->fnh", drug_feat.astype(dtype),
                           w1[:, :d].astype(dtype),
                           preferred_element_type=jnp.float32)
    proj_dis = jnp.einsum("fnd,fdh->fnh", dis_feat.astype(dtype),
                          w1[:, d:].astype(dtype),
                          preferred_element_type=jnp.float32)
    n_folds = drug_feat.shape[0]
    if train and dropout_rate > 0.0:
        assert key is not None
        seed = jax.vmap(lambda k: jax.random.randint(
            k, (), 0, np.iinfo(np.int32).max, dtype=jnp.int32))(key)
    else:
        seed = jnp.zeros((n_folds,), jnp.int32)
    if mesh is not None:
        logits = fused_grid_decoder_batched_spmd(
            mesh, fold_axis, shard_axis, proj_drug, proj_dis,
            params["b1"], params["w2"], params["b2"],
            params["w3"][:, :, 0], seed, dropout_rate, train, dtype)
    else:
        logits = fused_grid_decoder_batched(
            proj_drug, proj_dis, params["b1"], params["w2"], params["b2"],
            params["w3"][:, :, 0], seed, dropout_rate, train, dtype)
    return logits + params["b3"][:, :, None]

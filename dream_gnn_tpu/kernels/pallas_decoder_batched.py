"""Fold-batched fused per-edge MLP decoder — Pallas TPU kernel.

Same per-edge pipeline as kernels/pallas_decoder.py (see its module
docstring for the layout rules), with one extra leading grid axis over
independent folds: fold-parallel training (train/stacked.py) scores
every fold's candidate edges in ONE kernel launch, each fold using its
own node projection tables, MLP weights, and dropout seed.

Why a dedicated batched kernel instead of ``jax.vmap``: a pallas_call
has no batching rule, so the vmapped training step would fall back to
the XLA decoder whose (F, E, H) HBM intermediates dominate the step
(~22 ms/fold-step at lrssl scale vs 5.7 ms for the fused sequential
path — the whole point of fold batching would be lost).  Here the fold
axis is just the outer, slowest grid dimension: per-fold tables and
weights are pipelined block inputs, gradient accumulators are per-fold
output blocks initialised at the first edge tile of each fold
(``i == 0``), and the PRNG is reseeded per (fold, tile) so fold f
reproduces exactly the stream the single-fold kernel would draw with
the same seed.

Replaces: reference MLPDecoder (layers.py:341-379) + DGL apply_edges
(layers.py:364), for the fold-batched protocol runner.
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
from dream_gnn_tpu.kernels.common import onehot3 as _onehot3
from dream_gnn_tpu.kernels.pallas_decoder import (MAX_ONEHOT_NODES, TILE,
                                                  _LANE, _ROWS, _row_forward,
                                                  _round_up)


def _fwd_kernel(seed_ref, src_ref, dst_ref, pd_ref, pv_ref, b1_ref, w2_ref,
                b2_ref, w3_ref, out_ref, *, rate: float, train: bool, dtype):
    f = pl.program_id(0)
    i = pl.program_id(1)
    if train and rate > 0.0:
        pltpu.prng_seed(seed_ref[f] + i)
    p_src = _onehot3(src_ref[0, 0], pd_ref.shape[1], dtype)
    p_dst = _onehot3(dst_ref[0, 0], pv_ref.shape[1], dtype)
    pdt = pd_ref[0].astype(dtype)
    pvt = pv_ref[0].astype(dtype)
    b1 = b1_ref[0]
    w2 = w2_ref[0]
    b2 = b2_ref[0]
    w3 = w3_ref[0]
    for r in range(_ROWS):
        _, _, _, _, h2d, _ = _row_forward(r, p_src, p_dst, pdt, pvt, b1,
                                          w2, b2, rate, train, dtype)
        out_ref[0, 0, :, r:r + 1] = jnp.sum(h2d * w3, axis=1, keepdims=True)


def _bwd_kernel(seed_ref, src_ref, dst_ref, pd_ref, pv_ref, b1_ref, w2_ref,
                b2_ref, w3_ref, g_ref,
                dpd_ref, dpv_ref, db1_ref, dw2_ref, db2_ref, dw3_ref,
                *, rate: float, train: bool, dtype):
    f = pl.program_id(0)
    i = pl.program_id(1)

    # The fold axis is the outer grid dim, so the per-fold accumulator
    # blocks stay VMEM-resident across that fold's edge tiles; clear
    # them at the fold's first tile.
    @pl.when(i == 0)
    def _init():
        dpd_ref[...] = jnp.zeros_like(dpd_ref)
        dpv_ref[...] = jnp.zeros_like(dpv_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)
        dw3_ref[...] = jnp.zeros_like(dw3_ref)

    use_drop = train and rate > 0.0
    if use_drop:
        pltpu.prng_seed(seed_ref[f] + i)
    p_src = _onehot3(src_ref[0, 0], pd_ref.shape[1], dtype)
    p_dst = _onehot3(dst_ref[0, 0], pv_ref.shape[1], dtype)
    pdt = pd_ref[0].astype(dtype)
    pvt = pv_ref[0].astype(dtype)
    b1 = b1_ref[0]
    w2 = w2_ref[0]
    b2 = b2_ref[0]
    w3 = w3_ref[0]

    for r in range(_ROWS):
        a1, h1d, m1, a2, h2d, m2 = _row_forward(
            r, p_src, p_dst, pdt, pvt, b1, w2, b2, rate, train, dtype)
        g = g_ref[0, 0, :, r:r + 1]                    # (128, 1)
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
        dpd_ref[0] += jnp.dot(p_src[r].T, da1.astype(dtype),
                              preferred_element_type=jnp.float32)
        dpv_ref[0] += jnp.dot(p_dst[r].T, da1.astype(dtype),
                              preferred_element_type=jnp.float32)


def _edge_blocks(edges, e_pad):
    """(F, 2, E) -> two (F, grid, 8, 128) int32 id tile arrays."""
    f, _, e = edges.shape
    pad = e_pad - e
    ids = jnp.pad(edges.astype(jnp.int32), ((0, 0), (0, 0), (0, pad)))
    grid = e_pad // TILE
    return (ids[:, 0].reshape(f, grid, _ROWS, _LANE),
            ids[:, 1].reshape(f, grid, _ROWS, _LANE))


_EDGE_SPEC = pl.BlockSpec((1, 1, _ROWS, _LANE),
                          lambda f, i, *_: (f, i, 0, 0),
                          memory_space=pltpu.VMEM)
_OUT_SPEC = pl.BlockSpec((1, 1, _LANE, _ROWS),
                         lambda f, i, *_: (f, i, 0, 0),
                         memory_space=pltpu.VMEM)


def _fold_spec(*block_shape):
    """Whole per-fold block, indexed by the fold grid axis only."""
    return pl.BlockSpec((1,) + block_shape,
                        lambda f, i, *_: (f,) + (0,) * len(block_shape),
                        memory_space=pltpu.VMEM)


def _unscramble(out4):
    """(F, grid, 128, 8) -> (F, E_pad): edge e = g*TILE + r*128 + i of
    fold f lives at out4[f, g, i, r]."""
    f = out4.shape[0]
    return out4.transpose(0, 1, 3, 2).reshape(f, -1)


def _scramble(flat):
    f, e_pad = flat.shape
    grid = e_pad // TILE
    return flat.reshape(f, grid, _ROWS, _LANE).transpose(0, 1, 3, 2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def fused_decoder_batched(proj_drug, proj_dis, b1, w2, b2, w3, b3, edges,
                          seed, rate: float, train: bool,
                          dtype=jnp.bfloat16):
    """Fold-batched fused decoder MLP.

    Args (leading F = fold axis everywhere):
      proj_drug: (F, Nd, H1) fp32; proj_dis: (F, Nv, H1) fp32.
      b1: (F, H1); w2: (F, H1, H2); b2: (F, H2); w3: (F, H2); b3: (F, 1).
      edges: (F, 2, E) int32; seed: (F,) int32 — per-fold dropout seed.
    Returns logits (F, E) fp32.
    """
    out, _ = _fwd_impl(proj_drug, proj_dis, b1, w2, b2, w3, b3, edges,
                       seed, rate, train, dtype)
    return out


def _fwd_impl(proj_drug, proj_dis, b1, w2, b2, w3, b3, edges, seed,
              rate, train, dtype):
    f, _, e = edges.shape
    e_pad = _round_up(max(e, TILE), TILE)
    srcb, dstb = _edge_blocks(edges, e_pad)
    grid_e = e_pad // TILE
    nd, h1 = proj_drug.shape[1:]
    nv = proj_dis.shape[1]
    h2 = w2.shape[2]

    out4 = pl.pallas_call(
        functools.partial(_fwd_kernel, rate=rate, train=train, dtype=dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(f, grid_e),
            in_specs=[_EDGE_SPEC, _EDGE_SPEC,
                      _fold_spec(nd, h1), _fold_spec(nv, h1),
                      _fold_spec(1, h1), _fold_spec(h1, h2),
                      _fold_spec(1, h2), _fold_spec(1, h2)],
            out_specs=_OUT_SPEC,
        ),
        out_shape=jax.ShapeDtypeStruct((f, grid_e, _LANE, _ROWS),
                                       jnp.float32),
        interpret=pd.INTERPRET,
    )(seed.astype(jnp.int32), srcb, dstb, proj_drug, proj_dis,
      b1[:, None, :], w2, b2[:, None, :], w3[:, None, :])
    residuals = (proj_drug, proj_dis, b1, w2, b2, w3, edges, seed)
    return _unscramble(out4)[:, :e] + b3, residuals


def _fused_decoder_batched_fwd(proj_drug, proj_dis, b1, w2, b2, w3, b3,
                               edges, seed, rate, train, dtype):
    return _fwd_impl(proj_drug, proj_dis, b1, w2, b2, w3, b3, edges,
                     seed, rate, train, dtype)


def _fused_decoder_batched_bwd(rate, train, dtype, res, g):
    proj_drug, proj_dis, b1, w2, b2, w3, edges, seed = res
    f, _, e = edges.shape
    e_pad = _round_up(max(e, TILE), TILE)
    srcb, dstb = _edge_blocks(edges, e_pad)
    g4 = _scramble(jnp.pad(g, ((0, 0), (0, e_pad - e))))
    nd, h1 = proj_drug.shape[1:]
    nv = proj_dis.shape[1]
    h2 = w2.shape[2]

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, rate=rate, train=train, dtype=dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(f, e_pad // TILE),
            in_specs=[_EDGE_SPEC, _EDGE_SPEC,
                      _fold_spec(nd, h1), _fold_spec(nv, h1),
                      _fold_spec(1, h1), _fold_spec(h1, h2),
                      _fold_spec(1, h2), _fold_spec(1, h2), _OUT_SPEC],
            out_specs=[_fold_spec(nd, h1), _fold_spec(nv, h1),
                       _fold_spec(1, h1), _fold_spec(h1, h2),
                       _fold_spec(1, h2), _fold_spec(1, h2)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((f, nd, h1), jnp.float32),
            jax.ShapeDtypeStruct((f, nv, h1), jnp.float32),
            jax.ShapeDtypeStruct((f, 1, h1), jnp.float32),
            jax.ShapeDtypeStruct((f, h1, h2), jnp.float32),
            jax.ShapeDtypeStruct((f, 1, h2), jnp.float32),
            jax.ShapeDtypeStruct((f, 1, h2), jnp.float32),
        ],
        interpret=pd.INTERPRET,
    )(seed.astype(jnp.int32), srcb, dstb, proj_drug, proj_dis,
      b1[:, None, :], w2, b2[:, None, :], w3[:, None, :], g4)

    dpd, dpv, db1, dw2, db2, dw3 = outs
    db3 = jnp.sum(g, axis=1, keepdims=True)
    f0 = np.zeros(edges.shape, jax.dtypes.float0)
    s0 = np.zeros(seed.shape, jax.dtypes.float0)
    return (dpd, dpv, db1[:, 0], dw2, db2[:, 0], dw3[:, 0], db3, f0, s0)


fused_decoder_batched.defvjp(_fused_decoder_batched_fwd,
                             _fused_decoder_batched_bwd)


def fused_decoder_batched_spmd(mesh, fold_axis, shard_axis, proj_drug,
                               proj_dis, b1, w2, b2, w3, b3, edges, seed,
                               rate: float, train: bool, dtype):
    """SPMD partitioning rule for the fold-batched fused decoder.

    The kernel itself is purely per-edge, so the natural layout is the
    stacked-fold sharding (sharding/partition.py): the fold axis over
    ``fold_axis`` (dp) and the edge dimension over ``shard_axis`` (mp).
    Each device runs the unmodified kernel on its (F/dp, E/mp) block;
    shard_map's reverse-mode transpose inserts the psum over
    ``shard_axis`` for the projection-table/weight gradients (they are
    replicated along the edge shards).  Both axes are padded up to
    divisibility and the pad edges' logits sliced away (their cotangent
    is zero, so they add nothing to any gradient).

    Dropout: each edge shard offsets the per-fold seed by its
    ``shard_axis`` index so shards draw independent streams — with
    dropout on, the multi-chip stream differs from (but is distributed
    identically to) the single-chip kernel's.
    """
    from jax.sharding import PartitionSpec as P

    dp_n = mesh.shape[fold_axis]
    mp_n = mesh.shape[shard_axis]
    f, _, e = edges.shape
    f_pad = _round_up(f, dp_n)
    e_pad = _round_up(e, mp_n)

    def padf(x):
        return jnp.pad(x, ((0, f_pad - f),) + ((0, 0),) * (x.ndim - 1))

    edges_p = jnp.pad(edges, ((0, f_pad - f), (0, 0), (0, e_pad - e)))

    def local(pdl, pvl, b1l, w2l, b2l, w3l, b3l, el, sl):
        sl = sl + jax.lax.axis_index(shard_axis).astype(jnp.int32) \
            * jnp.int32(1000003)
        return fused_decoder_batched(pdl, pvl, b1l, w2l, b2l, w3l, b3l,
                                     el, sl, rate, train, dtype)

    fold = lambda *rest: P(fold_axis, *rest)            # noqa: E731
    # check_vma=False: pallas_call carries no varying-mesh-axes info;
    # gradient psums still come from the in_specs (verified against the
    # XLA decoder in tests/test_decoder_spmd.py).
    logits = jax.shard_map(
        local, mesh=mesh, check_vma=False,
        in_specs=(fold(None, None), fold(None, None), fold(None),
                  fold(None, None), fold(None), fold(None), fold(None),
                  fold(None, shard_axis), fold()),
        out_specs=fold(shard_axis),
    )(padf(proj_drug), padf(proj_dis), padf(b1), padf(w2), padf(b2),
      padf(w3), padf(b3), edges_p, padf(seed))
    return logits[:f, :e]


def decoder_apply_fused_batched(params, edge_src, edge_dst, drug_feat,
                                dis_feat, *, dropout_rate: float,
                                train: bool = False,
                                key: Optional[jax.Array] = None,
                                dtype=jnp.bfloat16, mesh=None,
                                fold_axis: str = "dp",
                                shard_axis: str = "mp"):
    """Fold-batched drop-in for nn.decoder.decoder_apply.

    All of ``params`` (leaves), ``edge_src``/``edge_dst`` (F, E),
    ``drug_feat``/``dis_feat`` (F, N, d), and ``key`` (F,) carry a
    leading fold axis.  Per-fold dropout seeds derive from ``key``
    exactly like the single-fold fused path, so fold f's stream matches
    a single-fold kernel launch with the same key.

    With ``mesh`` the kernel runs under its shard_map partitioning rule
    (fold axis -> ``fold_axis``, edge dim -> ``shard_axis``; see
    fused_decoder_batched_spmd) instead of falling back to the XLA
    decoder on the multi-chip path.
    """
    n_nodes = max(drug_feat.shape[1], dis_feat.shape[1])
    if n_nodes > MAX_ONEHOT_NODES:
        raise ValueError(
            f"batched fused decoder: {n_nodes} nodes exceeds "
            f"MAX_ONEHOT_NODES={MAX_ONEHOT_NODES} — use "
            f"decoder_backend='xla'")
    d = drug_feat.shape[2]
    w1 = params["w1"]
    proj_drug = jnp.einsum("fnd,fdh->fnh", drug_feat.astype(dtype),
                           w1[:, :d].astype(dtype),
                           preferred_element_type=jnp.float32)
    proj_dis = jnp.einsum("fnd,fdh->fnh", dis_feat.astype(dtype),
                          w1[:, d:].astype(dtype),
                          preferred_element_type=jnp.float32)
    edges = jnp.stack([edge_src.astype(jnp.int32),
                       edge_dst.astype(jnp.int32)], axis=1)
    n_folds = edges.shape[0]
    if train and dropout_rate > 0.0:
        assert key is not None
        seed = jax.vmap(lambda k: jax.random.randint(
            k, (), 0, np.iinfo(np.int32).max, dtype=jnp.int32))(key)
    else:
        seed = jnp.zeros((n_folds,), jnp.int32)
    if mesh is not None:
        return fused_decoder_batched_spmd(
            mesh, fold_axis, shard_axis, proj_drug, proj_dis,
            params["b1"], params["w2"], params["b2"],
            params["w3"][:, :, 0], params["b3"], edges, seed,
            dropout_rate, train, dtype)
    logits = fused_decoder_batched(
        proj_drug, proj_dis, params["b1"], params["w2"], params["b2"],
        params["w3"][:, :, 0], params["b3"], edges, seed,
        dropout_rate, train, dtype)
    return logits

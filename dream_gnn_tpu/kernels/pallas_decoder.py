"""Fused per-edge MLP decoder — Pallas TPU kernel.

The decoder dominates the training step: scoring every candidate pair
runs a 3-layer MLP over ~E=467k edges, and the XLA lowering
materialises the (E, 128) and (E, 64) intermediates (and their dropout
masks) in HBM for both forward and backward — ~90% of step time at
lrssl scale (scripts/ablate_step.py).

This kernel fuses the whole per-edge pipeline into one VMEM-resident
pass over edge tiles of TILE=1024 edges (8 sub-rows of 128):

    for each 128-edge sub-row r:
        h1_r = relu(P_src[r] @ proj_drug + P_dst[r] @ proj_dis + b1)
        h1_r = dropout(h1_r)                     # on-core PRNG
        h2_r = relu(h1_r @ w2 + b2)              # MXU
        h2_r = dropout(h2_r)
        out[:, r] = h2_r @ w3                    # per-column store

Node projection tables (N, H1) are tiny (<1 MB) and stay fully in
VMEM; the row gathers are one-hot MXU matmuls (P @ table) — on TPU
this beats per-row dynamic addressing for node counts up to a few
thousand (the reference datasets are hundreds; Mosaic's dynamic_gather
is single-vreg-only anyway).  Dropout bits come from the per-core
hardware PRNG seeded per (step, tile), so no (E, H) mask arrays ever
exist.

Layout notes: edge ids live in (grid, 8, 128) int32 tiles and the
output in (grid, 128, 8) — TPU HBM tiling pads (N, 1) integer/float
columns to (N, 128), a 128x memory and DMA blowup, and Mosaic has no
1D vector ops, so everything stays in 2D/3D tile shapes.  The (128, 8)
output scramble is undone by one cheap XLA transpose outside.

The backward pass is a second Pallas kernel that *recomputes* the tile
intermediates from the same seeds (rematerialisation) and accumulates
dproj via the transposed one-hot matmuls — backward reads only the
(E,) cotangent and writes node-table-sized gradients.

Replaces: reference MLPDecoder (layers.py:341-379) + DGL apply_edges
(the SDDMM-style gather, layers.py:364).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from dream_gnn_tpu.kernels.common import onehot3 as _onehot3

TILE = 1024          # edges per grid step
_LANE = 128
_ROWS = TILE // _LANE
INTERPRET = False    # tests flip this to run the kernels on CPU
MAX_ONEHOT_NODES = 8192   # beyond this the one-hot gather is wasteful


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _dropout_mask(shape, rate: float):
    """Keep-mask from the on-core PRNG (already seeded).

    prng_random_bits yields int32 — bitcast to uint32 BEFORE shifting
    (an arithmetic shift on the signed value would put u in [-0.5, 0.5)
    and silently halve the keep probability).
    """
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # Compare in the integer domain: Mosaic cannot cast uint32->f32.
    # P(bits >= rate * 2^32) == 1 - rate.
    thresh = jnp.uint32(min(max(rate, 0.0), 1.0) * 4294967295.0)
    return (bits >= thresh).astype(jnp.float32) / (1.0 - rate)



def _row_forward(r, p_src, p_dst, pd, pv, b1_ref, w2_ref, b2_ref,
                 rate, train, dtype):
    """One 128-edge sub-row; PRNG must already be seeded.  Returns
    (a1, h1d, m1, a2, h2d, m2)."""
    use_drop = train and rate > 0.0
    a1 = (jnp.dot(p_src[r], pd, preferred_element_type=jnp.float32)
          + jnp.dot(p_dst[r], pv, preferred_element_type=jnp.float32)
          + b1_ref[:])
    h1 = jnp.maximum(a1, 0.0)
    m1 = _dropout_mask(h1.shape, rate) if use_drop else None
    h1d = h1 * m1 if use_drop else h1
    a2 = jnp.dot(h1d.astype(dtype), w2_ref[:].astype(dtype),
                 preferred_element_type=jnp.float32) + b2_ref[:]
    h2 = jnp.maximum(a2, 0.0)
    m2 = _dropout_mask(h2.shape, rate) if use_drop else None
    h2d = h2 * m2 if use_drop else h2
    return a1, h1d, m1, a2, h2d, m2


def _fwd_kernel(seed_ref, src_ref, dst_ref, pd_ref, pv_ref, b1_ref, w2_ref,
                b2_ref, w3_ref, out_ref, *, rate: float,
                train: bool, dtype):
    i = pl.program_id(0)
    if train and rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + i)
    p_src = _onehot3(src_ref[0], pd_ref.shape[0], dtype)
    p_dst = _onehot3(dst_ref[0], pv_ref.shape[0], dtype)
    pd = pd_ref[:].astype(dtype)
    pv = pv_ref[:].astype(dtype)
    for r in range(_ROWS):
        _, _, _, _, h2d, _ = _row_forward(r, p_src, p_dst, pd, pv, b1_ref,
                                          w2_ref, b2_ref, rate, train,
                                          dtype)
        # out column r: (128, 1) = sum(h2d * w3, lanes).  The scalar
        # bias b3 is added OUTSIDE the kernel: fusing it into the
        # reduction init trips Mosaic's constant-accumulator limit.
        out_ref[0, :, r:r + 1] = jnp.sum(h2d * w3_ref[:], axis=1,
                                         keepdims=True)


def _bwd_kernel(seed_ref, src_ref, dst_ref, pd_ref, pv_ref, b1_ref, w2_ref,
                b2_ref, w3_ref, g_ref,
                dpd_ref, dpv_ref, db1_ref, dw2_ref, db2_ref, dw3_ref,
                *, rate: float, train: bool, dtype):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dpd_ref[:] = jnp.zeros_like(dpd_ref)
        dpv_ref[:] = jnp.zeros_like(dpv_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)
        dw3_ref[:] = jnp.zeros_like(dw3_ref)

    use_drop = train and rate > 0.0
    if use_drop:
        pltpu.prng_seed(seed_ref[0] + i)
    p_src = _onehot3(src_ref[0], pd_ref.shape[0], dtype)
    p_dst = _onehot3(dst_ref[0], pv_ref.shape[0], dtype)
    pd = pd_ref[:].astype(dtype)
    pv = pv_ref[:].astype(dtype)

    for r in range(_ROWS):
        # Recompute row r with the same PRNG stream as the forward.
        a1, h1d, m1, a2, h2d, m2 = _row_forward(
            r, p_src, p_dst, pd, pv, b1_ref, w2_ref, b2_ref, rate, train,
            dtype)
        g = g_ref[0, :, r:r + 1]                       # (128, 1)
        dw3_ref[:] += jnp.dot(g.T.astype(dtype), h2d.astype(dtype),
                              preferred_element_type=jnp.float32)
        dh2 = g * w3_ref[:]                            # (128, H2)
        if use_drop:
            dh2 = dh2 * m2
        da2 = jnp.where(a2 > 0.0, dh2, 0.0)
        dw2_ref[:] += jnp.dot(h1d.astype(dtype).T, da2.astype(dtype),
                              preferred_element_type=jnp.float32)
        db2_ref[:] += jnp.sum(da2, axis=0, keepdims=True)
        dh1 = jnp.dot(da2.astype(dtype), w2_ref[:].astype(dtype).T,
                      preferred_element_type=jnp.float32)
        if use_drop:
            dh1 = dh1 * m1
        da1 = jnp.where(a1 > 0.0, dh1, 0.0)
        db1_ref[:] += jnp.sum(da1, axis=0, keepdims=True)
        dpd_ref[:] += jnp.dot(p_src[r].T, da1.astype(dtype),
                              preferred_element_type=jnp.float32)
        dpv_ref[:] += jnp.dot(p_dst[r].T, da1.astype(dtype),
                              preferred_element_type=jnp.float32)


def _edge_blocks(edges, e_pad):
    """(2, E) -> (grid, 8, 128) int32 id tiles, padded with node 0."""
    e = edges.shape[1]
    pad = e_pad - e
    src = jnp.pad(edges[0].astype(jnp.int32), (0, pad))
    dst = jnp.pad(edges[1].astype(jnp.int32), (0, pad))
    grid = e_pad // TILE
    return (src.reshape(grid, _ROWS, _LANE),
            dst.reshape(grid, _ROWS, _LANE))


_EDGE_SPEC = pl.BlockSpec((1, _ROWS, _LANE), lambda i, *_: (i, 0, 0),
                          memory_space=pltpu.VMEM)
_OUT_SPEC = pl.BlockSpec((1, _LANE, _ROWS), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM)
_FULL = pl.BlockSpec(memory_space=pltpu.VMEM)


def _unscramble(out3):
    """(grid, 128, 8) column-major tile outputs -> flat (E_pad,).

    Edge e = g*TILE + r*128 + i lives at out3[g, i, r].
    """
    return out3.transpose(0, 2, 1).reshape(-1)


def _scramble(flat):
    grid = flat.shape[0] // TILE
    return flat.reshape(grid, _ROWS, _LANE).transpose(0, 2, 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def fused_decoder(proj_drug, proj_dis, b1, w2, b2, w3, b3, edges, seed,
                  rate: float, train: bool, dtype=jnp.bfloat16):
    """Fused decoder MLP over candidate edges.

    Args:
      proj_drug: (Nd, H1) fp32 — drug_feats @ w1[:d] (computed outside).
      proj_dis:  (Nv, H1) fp32.
      b1: (H1,); w2: (H1, H2); b2: (H2,); w3: (H2,); b3: (1,) fp32.
      edges: (2, E) int32 [src; dst]; seed: (1,) int32 traced scalar —
        vary per step for fresh dropout.
    Returns logits (E,) fp32.
    """
    out, _ = _fwd_impl(proj_drug, proj_dis, b1, w2, b2, w3, b3, edges,
                       seed, rate, train, dtype)
    return out


def _fwd_impl(proj_drug, proj_dis, b1, w2, b2, w3, b3, edges, seed,
              rate, train, dtype):
    e = edges.shape[1]
    e_pad = _round_up(max(e, TILE), TILE)
    srcb, dstb = _edge_blocks(edges, e_pad)
    grid = e_pad // TILE

    out3 = pl.pallas_call(
        functools.partial(_fwd_kernel, rate=rate, train=train, dtype=dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[_EDGE_SPEC, _EDGE_SPEC,
                      _FULL, _FULL, _FULL, _FULL, _FULL, _FULL],
            out_specs=_OUT_SPEC,
        ),
        out_shape=jax.ShapeDtypeStruct((grid, _LANE, _ROWS), jnp.float32),
        interpret=INTERPRET,
    )(seed.astype(jnp.int32), srcb, dstb, proj_drug, proj_dis,
      b1[None, :], w2, b2[None, :], w3[None, :])
    residuals = (proj_drug, proj_dis, b1, w2, b2, w3, edges, seed)
    return _unscramble(out3)[:e] + b3[0], residuals


def _fused_decoder_fwd(proj_drug, proj_dis, b1, w2, b2, w3, b3, edges,
                       seed, rate, train, dtype):
    return _fwd_impl(proj_drug, proj_dis, b1, w2, b2, w3, b3, edges,
                     seed, rate, train, dtype)


def _fused_decoder_bwd(rate, train, dtype, res, g):
    proj_drug, proj_dis, b1, w2, b2, w3, edges, seed = res
    e = edges.shape[1]
    e_pad = _round_up(max(e, TILE), TILE)
    srcb, dstb = _edge_blocks(edges, e_pad)
    g3 = _scramble(jnp.pad(g, (0, e_pad - e)))
    h1 = b1.shape[0]
    h2 = w2.shape[1]

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, rate=rate, train=train, dtype=dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(e_pad // TILE,),
            in_specs=[_EDGE_SPEC, _EDGE_SPEC,
                      _FULL, _FULL, _FULL, _FULL, _FULL, _FULL, _OUT_SPEC],
            out_specs=[_FULL] * 6,
        ),
        out_shape=[
            jax.ShapeDtypeStruct(proj_drug.shape, jnp.float32),
            jax.ShapeDtypeStruct(proj_dis.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, h1), jnp.float32),
            jax.ShapeDtypeStruct((h1, h2), jnp.float32),
            jax.ShapeDtypeStruct((1, h2), jnp.float32),
            jax.ShapeDtypeStruct((1, h2), jnp.float32),
        ],
        interpret=INTERPRET,
    )(seed.astype(jnp.int32), srcb, dstb, proj_drug, proj_dis,
      b1[None, :], w2, b2[None, :], w3[None, :], g3)

    dpd, dpv, db1, dw2, db2, dw3 = outs
    db3 = jnp.sum(g, keepdims=True)          # d/db3 (out + b3) in XLA
    f0 = np.zeros(edges.shape, jax.dtypes.float0)
    s0 = np.zeros(seed.shape, jax.dtypes.float0)
    return (dpd, dpv, db1[0], dw2, db2[0], dw3[0], db3,
            f0, s0)


fused_decoder.defvjp(_fused_decoder_fwd, _fused_decoder_bwd)


def decoder_apply_fused(params, edge_src, edge_dst, drug_feat, dis_feat, *,
                        dropout_rate: float, train: bool = False,
                        key: Optional[jax.Array] = None,
                        dtype=jnp.bfloat16):
    """Drop-in fused replacement for nn.decoder.decoder_apply.

    The node projections (tiny MXU matmuls) run in XLA so their w1
    gradient is free; the per-edge pipeline runs in the Pallas kernel.
    Dropout uses the on-core hardware PRNG keyed by a seed derived from
    ``key`` — same distribution as the XLA path, different stream.
    """
    n_nodes = max(drug_feat.shape[0], dis_feat.shape[0])
    if n_nodes > MAX_ONEHOT_NODES:
        raise ValueError(
            f"fused decoder: {n_nodes} nodes exceeds MAX_ONEHOT_NODES="
            f"{MAX_ONEHOT_NODES} (the one-hot gather tiles and VMEM node "
            f"tables scale with node count) — use decoder_backend='xla'")
    d = drug_feat.shape[1]
    proj_drug = jnp.dot(drug_feat.astype(dtype), params["w1"][:d].astype(dtype),
                        preferred_element_type=jnp.float32)
    proj_dis = jnp.dot(dis_feat.astype(dtype), params["w1"][d:].astype(dtype),
                       preferred_element_type=jnp.float32)
    edges = jnp.stack([edge_src.astype(jnp.int32),
                       edge_dst.astype(jnp.int32)])
    if train and dropout_rate > 0.0:
        assert key is not None
        seed = jax.random.randint(key, (1,), 0, np.iinfo(np.int32).max,
                                  dtype=jnp.int32)
    else:
        seed = jnp.zeros((1,), jnp.int32)
    logits = fused_decoder(proj_drug, proj_dis, params["b1"], params["w2"],
                           params["b2"], params["w3"][:, 0],
                           params["b3"], edges, seed,
                           dropout_rate, train, dtype)
    return logits

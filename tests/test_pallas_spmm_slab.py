"""Slab-streamed gather SpMM (v3) vs dense reference — CPU interpret.

Parity contract (kernels/pallas_spmm_slab.py): for any COO graph,
``spmm_slab(pair, x)`` must equal the dense scatter-add
``out[n] = sum_e val_e * x[src_e]`` and its VJP must equal the
transposed scatter-add — across uneven shapes, empty slabs, the
packed-bf16 panel path, and padding slots (val=0 never contributes).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dream_gnn_tpu.kernels.pallas_spmm_slab as pss
from dream_gnn_tpu.graph.slabbed import (auto_geometry,
                                         slabbed_from_arrays,
                                         slabbed_pair_from_arrays)


@pytest.fixture(autouse=True)
def _interpret():
    old = pss.INTERPRET
    pss.INTERPRET = True
    yield
    pss.INTERPRET = old


def _dense_ref(src, dst, val, x, n_dst):
    out = np.zeros((n_dst, x.shape[1]), np.float32)
    np.add.at(out, dst, val[:, None] * x[src])
    return out


CASES = [
    # (n_src, n_dst, e, d, tile, span, window)
    (1000, 900, 5000, 16, 256, 4, 3),
    (5000, 3000, 20000, 32, 256, 8, 3),
    (700, 700, 300, 16, 256, 4, 3),       # sparse -> empty slabs
    (300, 5000, 2000, 16, 512, 2, 2),     # n_src << n_dst
    (4000, 250, 9000, 16, 256, 8, 4),     # single dst tile
]


@pytest.mark.parametrize("ns,nd,e,d,tile,span,window", CASES)
def test_forward_matches_dense(ns, nd, e, d, tile, span, window):
    rng = np.random.default_rng(ns + e)
    src = rng.integers(0, ns, e)
    dst = rng.integers(0, nd, e)
    val = (rng.random(e) + 0.5).astype(np.float32)
    x = rng.normal(size=(ns, d)).astype(np.float32)
    g = slabbed_from_arrays(src, dst, val, ns, nd, tile=tile,
                            span=span, window=window)
    out = np.asarray(pss._spmm_slab_raw(g, jnp.asarray(x),
                                        dtype=jnp.float32))
    ref = _dense_ref(src, dst, val, x, nd)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_zero_weight_edges_are_dropped():
    """val==0 edges are stripped at build; a graph whose every edge is
    masked must produce exactly zero output (incl. untouched slabs)."""
    rng = np.random.default_rng(3)
    ns = nd = 600
    src = rng.integers(0, ns, 100)
    dst = rng.integers(0, nd, 100)
    x = rng.normal(size=(ns, 8)).astype(np.float32)
    g = slabbed_from_arrays(src, dst, np.zeros(100, np.float32), ns, nd,
                            tile=256, span=2, window=2)
    assert g.n_live == 0
    out = np.asarray(pss._spmm_slab_raw(g, jnp.asarray(x),
                                        dtype=jnp.float32))
    np.testing.assert_allclose(out, 0.0)


def test_packed_bf16_path():
    rng = np.random.default_rng(11)
    ns = nd = 2000
    e, d = 10000, 32
    src = rng.integers(0, ns, e)
    dst = rng.integers(0, nd, e)
    val = (rng.random(e) + 0.5).astype(np.float32)
    x = rng.normal(size=(ns, d)).astype(np.float32)
    g = slabbed_from_arrays(src, dst, val, ns, nd, tile=256, span=8,
                            window=3)
    out = np.asarray(pss._spmm_slab_raw(g, jnp.asarray(x),
                                        dtype=jnp.bfloat16))
    ref = _dense_ref(src, dst, val, x, nd)
    np.testing.assert_allclose(out, ref, rtol=3e-2, atol=3e-2 *
                               np.abs(ref).max())


def test_grad_matches_transposed_scatter():
    rng = np.random.default_rng(7)
    ns, nd, e, d = 1500, 1200, 8000, 16
    src = rng.integers(0, ns, e)
    dst = rng.integers(0, nd, e)
    val = (rng.random(e) + 0.5).astype(np.float32)
    x = rng.normal(size=(ns, d)).astype(np.float32)
    pair = slabbed_pair_from_arrays(src, dst, val, ns, nd, tile=256,
                                    span=4, window=3)
    ref = _dense_ref(src, dst, val, x, nd)

    gx = jax.grad(lambda y: jnp.sum(
        pss.spmm_slab(pair, y, jnp.float32) ** 2))(jnp.asarray(x))
    gout = 2 * ref
    gx_ref = np.zeros_like(x)
    np.add.at(gx_ref, src, val[:, None] * gout[dst])
    np.testing.assert_allclose(np.asarray(gx), gx_ref, rtol=1e-4,
                               atol=1e-4 * np.abs(gx_ref).max())


def test_auto_geometry_prefers_small_tiles_when_dense():
    tile, span, window, k = auto_geometry(10_000_000, 100_000, 100_000)
    assert tile == 256 and window <= 8 and k * tile == 4096
    # Sparse relation (3M @ 100k^2) climbs to a taller tile rather
    # than blowing the window budget — and the taller tile must
    # shrink span/k to stay inside the 16 MiB scoped-VMEM limit
    # (2*span*SUB*d/2*4 + 2*k*d*tile*4 + tile*cs*SUB*4 <= budget).
    from dream_gnn_tpu.graph.slabbed import SUB, VMEM_BUDGET_V3, CS_V3
    tile_s, span_s, window_s, k_s = auto_geometry(
        3_000_000, 100_000, 100_000)
    assert window_s <= 8
    used = (2 * span_s * SUB * 64 * 4 + 2 * k_s * 128 * tile_s * 4
            + tile_s * CS_V3 * SUB * 4)
    assert used <= VMEM_BUDGET_V3


def test_builder_rejects_overwide_span():
    with pytest.raises(ValueError, match="span"):
        slabbed_from_arrays(np.arange(10), np.arange(10),
                            np.ones(10, np.float32), 100_000, 100,
                            span=256)


def test_prf_masked_slabbed_matches_dense():
    """PRF edge dropout on the slabbed layout: fwd AND grad match the
    dense computation with the same physical mask (the fwd and
    transposed layouts share physical edge ids)."""
    import dataclasses as dc

    from dream_gnn_tpu.augment.masks import prf_keep_mask

    rng = np.random.default_rng(5)
    n_src, n_dst, e = 300, 400, 2000
    src = rng.integers(0, n_src, e)
    dst = rng.integers(0, n_dst, e)
    val = (rng.random(e) + 0.5).astype(np.float32)
    pair = slabbed_pair_from_arrays(src, dst, val, n_src, n_dst,
                                    tile=256, span=4, window=3)
    salt = jnp.asarray(12345, jnp.uint32)
    rate = 0.4
    mask = np.asarray(prf_keep_mask(salt, jnp.arange(e), rate))
    a = np.zeros((n_dst, n_src), np.float32)
    np.add.at(a, (dst, src), val * mask)

    mp = dc.replace(
        pair,
        fwd=dc.replace(pair.fwd, val=pair.fwd.val * prf_keep_mask(
            salt, pair.fwd.edge_id, rate)),
        bwd=dc.replace(pair.bwd, val=pair.bwd.val * prf_keep_mask(
            salt, pair.bwd.edge_id, rate)))

    x = jnp.asarray(rng.normal(size=(n_src, 32)).astype(np.float32))
    out = np.asarray(pss.spmm_slab(mp, x, jnp.float32))
    np.testing.assert_allclose(out, a @ np.asarray(x), rtol=1e-4,
                               atol=1e-4)
    grad = jax.grad(lambda y: jnp.sum(
        pss.spmm_slab(mp, y, jnp.float32) ** 2))(x)
    expected = 2.0 * a.T @ (a @ np.asarray(x))
    np.testing.assert_allclose(np.asarray(grad), expected, rtol=1e-3,
                               atol=1e-3)


def test_slabbed_enc_graph_forward():
    """BipartiteSlabbed enc graph runs through the full model forward
    and matches the dense path (mirrors
    test_pallas_spmm_gather.test_grouped_enc_graph_forward)."""
    import dataclasses as dc

    from dream_gnn_tpu.config import TrainConfig
    from dream_gnn_tpu.data.loader import DreamDataset
    from dream_gnn_tpu.data.synthetic import synthetic_raw_data
    from dream_gnn_tpu.graph.slabbed import build_enc_graph_slabbed
    from dream_gnn_tpu.model.dream_gnn import forward, init_params
    from dream_gnn_tpu.train.loop import derive_model_cfg, fold_inputs

    raw = synthetic_raw_data(n_drug=30, n_dis=22, n_pos=60, seed=5)
    dataset = DreamDataset(raw, k=3)
    cfg = TrainConfig()
    model_cfg = dc.replace(derive_model_cfg(cfg, dataset),
                           layers=2, gcn_agg_units=48, gcn_out_units=16,
                           nhid1=24, nhid2=16)
    params = init_params(jax.random.key(0), model_cfg)
    inputs, _, _, _ = fold_inputs(dataset, 0)
    split = dataset.splits[0]

    slabbed = build_enc_graph_slabbed(split.train_pairs,
                                      split.train_values,
                                      dataset.n_drug, dataset.n_dis)
    s_inputs = dc.replace(inputs, enc_graph=slabbed)
    dense_out = forward(params, inputs, model_cfg, train=False)
    slab_out = forward(params, s_inputs, model_cfg, train=False)
    for a, b in zip(dense_out, slab_out):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-2, atol=5e-3)


def test_slabbed_train_step_with_augmentation():
    """Full train step on the slabbed layout with default augmentation
    (edge_dropout via PRF masks + feature noise)."""
    import dataclasses as dc

    from dream_gnn_tpu.config import TrainConfig
    from dream_gnn_tpu.data.loader import DreamDataset
    from dream_gnn_tpu.data.synthetic import synthetic_raw_data
    from dream_gnn_tpu.graph.slabbed import build_enc_graph_slabbed
    from dream_gnn_tpu.model.dream_gnn import init_params
    from dream_gnn_tpu.train.loop import derive_model_cfg, fold_inputs
    from dream_gnn_tpu.train.optim import make_optimizer
    from dream_gnn_tpu.train.step import TrainState, make_one_step

    raw = synthetic_raw_data(n_drug=30, n_dis=22, n_pos=60, seed=5)
    dataset = DreamDataset(raw, k=3)
    cfg = TrainConfig()
    model_cfg = dc.replace(derive_model_cfg(cfg, dataset),
                           layers=1, gcn_agg_units=48, gcn_out_units=16,
                           nhid1=24, nhid2=16)
    inputs, _, labels, _ = fold_inputs(dataset, 0)
    split = dataset.splits[0]
    slabbed = build_enc_graph_slabbed(split.train_pairs,
                                      split.train_values,
                                      dataset.n_drug, dataset.n_dis)
    s_inputs = dc.replace(inputs, enc_graph=slabbed)

    tx = make_optimizer(cfg.train_grad_clip, cfg.weight_decay)
    one_step = make_one_step(model_cfg, cfg, tx)
    params = init_params(jax.random.key(0), model_cfg)
    state = TrainState(params=params, opt_state=tx.init(params),
                       key=jax.random.key(1),
                       lr=jnp.asarray(cfg.train_lr))
    w = dataset.fold(0).train_w
    state, loss = jax.jit(one_step)(state, s_inputs, labels, w)
    assert np.isfinite(float(loss))


def test_slab_ablate_modes_change_the_program():
    """The measurement-only _ablate modes must compile genuinely
    different programs — each mode's output is deliberately wrong in a
    mode-specific way."""
    rng = np.random.default_rng(13)
    ns, nd, e = 700, 600, 3000
    src = rng.integers(0, ns, e)
    dst = rng.integers(0, nd, e)
    val = (rng.random(e) + 0.5).astype(np.float32)
    x = rng.normal(size=(ns, 32)).astype(np.float32)
    g = slabbed_from_arrays(src, dst, val, ns, nd, tile=256, span=4,
                            window=3)
    base = np.asarray(pss._spmm_slab_raw(g, jnp.asarray(x),
                                         dtype=jnp.float32))
    outs = {ab: np.asarray(pss._spmm_slab_raw(
        g, jnp.asarray(x), dtype=jnp.float32, _ablate=ab))
        for ab in ("gather_only", "no_matmul", "no_accum")}
    for ab, out in outs.items():
        assert not np.allclose(out, base), ab
    assert not np.allclose(outs["gather_only"], outs["no_matmul"])


def test_vmem_guard_rejects_unbudgeted_width():
    """A layout budgeted for packed d=128 panels must refuse an
    unpacked wide call with a clear error instead of dying in the
    remote Mosaic compiler (r5 review finding)."""
    rng = np.random.default_rng(2)
    ns = nd = 20000
    src = rng.integers(0, ns, 50000)
    dst = rng.integers(0, nd, 50000)
    val = np.ones(50000, np.float32)
    g = slabbed_from_arrays(src, dst, val, ns, nd, span=128, tile=256)
    x = jnp.asarray(rng.normal(size=(ns, 384)).astype(np.float32))
    with pytest.raises(ValueError, match="scoped-VMEM"):
        pss._spmm_slab_raw(g, x, dtype=jnp.float32)

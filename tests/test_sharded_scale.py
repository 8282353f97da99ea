"""Mesh-sharded full-model training (sharding/scale_graph.py) vs the
single-device padded-COO path, on the virtual 8-device CPU mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dream_gnn_tpu.config import AugmentConfig, TrainConfig
from dream_gnn_tpu.data.loader import DreamDataset
from dream_gnn_tpu.data.synthetic import synthetic_raw_data
from dream_gnn_tpu.graph.bipartite_coo import build_enc_graph_coo
from dream_gnn_tpu.model.dream_gnn import forward, init_params
from dream_gnn_tpu.sharding.mesh import make_mesh
from dream_gnn_tpu.sharding.scale_graph import build_enc_graph_sharded
from dream_gnn_tpu.train.loop import derive_model_cfg, fold_inputs


@pytest.fixture(scope="module")
def setup():
    raw = synthetic_raw_data(n_drug=30, n_dis=22, n_pos=60, seed=5)
    dataset = DreamDataset(raw, k=3)
    cfg = TrainConfig()
    model_cfg = dataclasses.replace(
        derive_model_cfg(cfg, dataset),
        layers=3, gcn_agg_units=48, gcn_out_units=16, nhid1=24, nhid2=16)
    params = init_params(jax.random.key(0), model_cfg)
    mesh = make_mesh(dp=8, mp=1)
    return dataset, model_cfg, params, mesh


def _graphs(dataset, mesh):
    split = dataset.splits[0]
    coo = build_enc_graph_coo(split.train_pairs, split.train_values,
                              dataset.n_drug, dataset.n_dis)
    sharded = build_enc_graph_sharded(
        split.train_pairs, split.train_values, dataset.n_drug,
        dataset.n_dis, mesh, "dp", pad_multiple=8)
    return coo, sharded


def test_sharded_forward_matches_coo(setup):
    dataset, model_cfg, params, mesh = setup
    inputs, _, _, _ = fold_inputs(dataset, 0)
    coo, sharded = _graphs(dataset, mesh)
    np.testing.assert_allclose(np.asarray(sharded.ci_dis),
                               np.asarray(coo.ci_dis), rtol=1e-6)

    coo_out = forward(params, dataclasses.replace(inputs, enc_graph=coo),
                      model_cfg, train=False)
    sh_out = jax.jit(lambda p, i: forward(p, i, model_cfg, train=False))(
        params, dataclasses.replace(inputs, enc_graph=sharded))
    for a, b in zip(coo_out, sh_out):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-5)


def test_sharded_grads_match_coo(setup):
    """Backward through the shard_map halo exchange (all_gather ->
    reduce_scatter transpose) matches single-device grads."""
    dataset, model_cfg, params, mesh = setup
    inputs, _, labels, _ = fold_inputs(dataset, 0)
    coo, sharded = _graphs(dataset, mesh)

    def loss(p, gr):
        pred, *_ = forward(p, dataclasses.replace(inputs, enc_graph=gr),
                           model_cfg, train=False)
        return jnp.mean(pred ** 2)

    g_coo = jax.grad(loss)(params, coo)
    g_sh = jax.jit(jax.grad(loss))(params, sharded)
    flat_c, _ = jax.tree.flatten(g_coo)
    flat_s, _ = jax.tree.flatten(g_sh)
    for a, b in zip(flat_c, flat_s):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=1e-5)


def test_sharded_train_step_with_augmentation(setup):
    """Full train step (edge_dropout + feature_noise) on the sharded
    layout: runs under jit over the mesh, finite loss, params move."""
    from dream_gnn_tpu.train.optim import make_optimizer
    from dream_gnn_tpu.train.step import TrainState, make_one_step

    dataset, model_cfg, params, mesh = setup
    cfg = TrainConfig()
    inputs, _, labels, _ = fold_inputs(dataset, 0)
    _, sharded = _graphs(dataset, mesh)
    sh_inputs = dataclasses.replace(inputs, enc_graph=sharded)

    tx = make_optimizer(cfg.train_grad_clip, cfg.weight_decay)
    one_step = make_one_step(model_cfg, cfg, tx)
    state = TrainState(params=params, opt_state=tx.init(params),
                       key=jax.random.key(1),
                       lr=jnp.asarray(cfg.train_lr))
    w = dataset.fold(0).train_w
    state2, loss = jax.jit(one_step)(state, sh_inputs, labels, w)
    assert np.isfinite(float(loss))
    delta = jax.tree.reduce(
        lambda acc, x: acc + float(jnp.sum(jnp.abs(x))),
        jax.tree.map(jnp.subtract, state2.params, params), 0.0)
    assert delta > 0.0


def test_sharded_grouped_forward_matches_coo(setup):
    """Per-shard Pallas gather kernel (interpret mode) inside the halo
    exchange matches the COO path."""
    import dream_gnn_tpu.kernels.pallas_spmm_gather as psg

    from dream_gnn_tpu.sharding.scale_graph import \
        build_enc_graph_sharded_grouped

    dataset, model_cfg, params, _ = setup
    mesh = _grouped_mesh()
    inputs, _, _, _ = fold_inputs(dataset, 0)
    split = dataset.splits[0]
    coo = build_enc_graph_coo(split.train_pairs, split.train_values,
                              dataset.n_drug, dataset.n_dis)
    shg = build_enc_graph_sharded_grouped(
        split.train_pairs, split.train_values, dataset.n_drug,
        dataset.n_dis, mesh, "dp")

    old = psg.INTERPRET
    psg.INTERPRET = True
    try:
        coo_out = forward(params,
                          dataclasses.replace(inputs, enc_graph=coo),
                          model_cfg, train=False)
        sh_out = jax.jit(lambda p, i: forward(p, i, model_cfg,
                                              train=False))(
            params, dataclasses.replace(inputs, enc_graph=shg))
        # bf16 scatter-matmul operands in the gather kernel (same
        # tolerance as test_grouped_enc_graph_forward)
        for a, b in zip(coo_out, sh_out):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=5e-2, atol=5e-3)
    finally:
        psg.INTERPRET = old


def test_sharded_grouped_train_step_with_augmentation(setup):
    """Full augmented train step (PRF edge dropout) on the
    sharded-grouped layout: finite loss, params move.

    Smoke-shaped on purpose: 2 shards + 1 GCMC layer keep the
    interpret-kernel compile surface small (the 4-shard/3-layer step
    was the suite's slowest test at ~2 min; numerics parity is pinned
    by test_sharded_grouped_forward_matches_coo at full shape)."""
    import dream_gnn_tpu.kernels.pallas_spmm_gather as psg

    from dream_gnn_tpu.sharding.scale_graph import \
        build_enc_graph_sharded_grouped
    from dream_gnn_tpu.train.optim import make_optimizer
    from dream_gnn_tpu.train.step import TrainState, make_one_step

    dataset, model_cfg, params, _ = setup
    model_cfg = dataclasses.replace(model_cfg, layers=1)
    params = init_params(jax.random.key(0), model_cfg)
    mesh = make_mesh(dp=2, mp=1, devices=jax.devices()[:2])
    cfg = TrainConfig()
    inputs, _, labels, _ = fold_inputs(dataset, 0)
    split = dataset.splits[0]
    shg = build_enc_graph_sharded_grouped(
        split.train_pairs, split.train_values, dataset.n_drug,
        dataset.n_dis, mesh, "dp")

    tx = make_optimizer(cfg.train_grad_clip, cfg.weight_decay)
    one_step = make_one_step(model_cfg, cfg, tx)
    state = TrainState(params=params, opt_state=tx.init(params),
                       key=jax.random.key(1),
                       lr=jnp.asarray(cfg.train_lr))
    w = dataset.fold(0).train_w
    old = psg.INTERPRET
    psg.INTERPRET = True
    try:
        state2, loss = jax.jit(one_step)(
            state, dataclasses.replace(inputs, enc_graph=shg), labels, w)
        assert np.isfinite(float(loss))
    finally:
        psg.INTERPRET = old


def test_sharded_no_aug_step_matches_coo(setup):
    """With augmentation off and identical PRNG keys, one train step on
    the sharded layout reproduces the COO-path loss."""
    from dream_gnn_tpu.train.optim import make_optimizer
    from dream_gnn_tpu.train.step import TrainState, make_one_step

    dataset, model_cfg, params, mesh = setup
    cfg = TrainConfig(augment=AugmentConfig(methods=()))
    model_nodrop = dataclasses.replace(model_cfg, dropout=0.0,
                                       attention_dropout=0.0)
    inputs, _, labels, _ = fold_inputs(dataset, 0)
    coo, sharded = _graphs(dataset, mesh)

    tx = make_optimizer(cfg.train_grad_clip, cfg.weight_decay)
    one_step = make_one_step(model_nodrop, cfg, tx)
    w = dataset.fold(0).train_w

    def run(graph):
        state = TrainState(params=params, opt_state=tx.init(params),
                           key=jax.random.key(1),
                           lr=jnp.asarray(cfg.train_lr))
        state, loss = jax.jit(one_step)(
            state, dataclasses.replace(inputs, enc_graph=graph),
            labels, w)
        return float(loss)

    assert run(sharded) == pytest.approx(run(coo), rel=1e-5)


def _ring_setup(setup):
    """Interpret-mode ring tests run S^2 sub-block kernels per relation
    direction; shrink to a 2-device mesh and 2 layers to keep the suite
    fast while still exercising a real multi-step ring (one ppermute
    rotation + the transposed backward ring)."""
    import dataclasses as _dc
    dataset, model_cfg, params, _ = setup
    model_cfg = _dc.replace(model_cfg, layers=1)
    params = init_params(jax.random.key(0), model_cfg)
    mesh = make_mesh(dp=2, mp=1, devices=jax.devices()[:2])
    return dataset, model_cfg, params, mesh


def _grouped_mesh():
    """Interpret-mode grouped tests run one gather kernel per shard per
    relation direction; a 4-device mesh halves that vs the module's
    8-device mesh while still exercising multi-shard halo exchange."""
    return make_mesh(dp=4, mp=1, devices=jax.devices()[:4])


def test_ring_forward_matches_coo(setup):
    """Ring-overlapped halo exchange (ppermute double-buffering,
    interpret-mode gather kernel) matches the COO path."""
    import dream_gnn_tpu.kernels.pallas_spmm_gather as psg

    from dream_gnn_tpu.sharding.scale_graph import \
        build_enc_graph_sharded_grouped

    dataset, model_cfg, params, mesh = _ring_setup(setup)
    inputs, _, _, _ = fold_inputs(dataset, 0)
    split = dataset.splits[0]
    coo = build_enc_graph_coo(split.train_pairs, split.train_values,
                              dataset.n_drug, dataset.n_dis)
    shg = build_enc_graph_sharded_grouped(
        split.train_pairs, split.train_values, dataset.n_drug,
        dataset.n_dis, mesh, "dp", ring=True)
    assert shg.ring and shg.n_drug == dataset.n_drug \
        and shg.n_dis == dataset.n_dis

    old = psg.INTERPRET
    psg.INTERPRET = True
    try:
        coo_out = forward(params,
                          dataclasses.replace(inputs, enc_graph=coo),
                          model_cfg, train=False)
        sh_out = jax.jit(lambda p, i: forward(p, i, model_cfg,
                                              train=False))(
            params, dataclasses.replace(inputs, enc_graph=shg))
        for a, b in zip(coo_out, sh_out):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=5e-2, atol=5e-3)
    finally:
        psg.INTERPRET = old


@pytest.mark.slow
def test_ring_train_step_with_augmentation(setup):
    """Full augmented train step (PRF edge dropout) on the ring
    layout: finite loss, and the backward ring (transposed ppermute)
    produces moving params.

    slow tier: ~1 min of interpret-kernel compile; the default tier
    keeps ring fwd numerics (test_ring_forward_matches_coo) and the
    fwd+bwd loss parity (test_ring_no_dropout_loss_matches_coo), which
    cover the same ring code paths without the augment plumbing."""
    import dream_gnn_tpu.kernels.pallas_spmm_gather as psg

    from dream_gnn_tpu.sharding.scale_graph import \
        build_enc_graph_sharded_grouped
    from dream_gnn_tpu.train.optim import make_optimizer
    from dream_gnn_tpu.train.step import TrainState, make_one_step

    dataset, model_cfg, params, mesh = _ring_setup(setup)
    cfg = TrainConfig()
    inputs, _, labels, _ = fold_inputs(dataset, 0)
    split = dataset.splits[0]
    shg = build_enc_graph_sharded_grouped(
        split.train_pairs, split.train_values, dataset.n_drug,
        dataset.n_dis, mesh, "dp", ring=True)

    tx = make_optimizer(cfg.train_grad_clip, cfg.weight_decay)
    one_step = make_one_step(model_cfg, cfg, tx)
    state = TrainState(params=params, opt_state=tx.init(params),
                       key=jax.random.key(1),
                       lr=jnp.asarray(cfg.train_lr))
    w = dataset.fold(0).train_w
    old = psg.INTERPRET
    psg.INTERPRET = True
    try:
        state2, loss = jax.jit(one_step)(
            state, dataclasses.replace(inputs, enc_graph=shg), labels, w)
        assert np.isfinite(float(loss))
        delta = jax.tree.reduce(
            lambda acc, x: acc + float(jnp.sum(jnp.abs(x))),
            jax.tree.map(jnp.subtract, state2.params, params), 0.0)
        assert delta > 0.0
    finally:
        psg.INTERPRET = old


def test_ring_no_dropout_loss_matches_coo(setup):
    """Augmentation and dropout off: one ring-layout train step
    reproduces the COO-path loss exactly (fwd AND bwd numerics)."""
    import dream_gnn_tpu.kernels.pallas_spmm_gather as psg

    from dream_gnn_tpu.sharding.scale_graph import \
        build_enc_graph_sharded_grouped
    from dream_gnn_tpu.train.optim import make_optimizer
    from dream_gnn_tpu.train.step import TrainState, make_one_step

    dataset, model_cfg, params, mesh = _ring_setup(setup)
    cfg = TrainConfig(augment=AugmentConfig(methods=()))
    model_nodrop = dataclasses.replace(model_cfg, dropout=0.0,
                                       attention_dropout=0.0)
    inputs, _, labels, _ = fold_inputs(dataset, 0)
    split = dataset.splits[0]
    coo = build_enc_graph_coo(split.train_pairs, split.train_values,
                              dataset.n_drug, dataset.n_dis)
    shg = build_enc_graph_sharded_grouped(
        split.train_pairs, split.train_values, dataset.n_drug,
        dataset.n_dis, mesh, "dp", ring=True)

    tx = make_optimizer(cfg.train_grad_clip, cfg.weight_decay)
    one_step = make_one_step(model_nodrop, cfg, tx)
    w = dataset.fold(0).train_w

    def run(graph):
        state = TrainState(params=params, opt_state=tx.init(params),
                           key=jax.random.key(1),
                           lr=jnp.asarray(cfg.train_lr))
        state, loss = jax.jit(one_step)(
            state, dataclasses.replace(inputs, enc_graph=graph),
            labels, w)
        return float(loss)

    old = psg.INTERPRET
    psg.INTERPRET = True
    try:
        # gather kernel uses bf16 scatter-matmul operands on both paths
        # only on the grouped layouts; COO path is fp32 -> loose rel tol
        assert run(shg) == pytest.approx(run(coo), rel=2e-2)
    finally:
        psg.INTERPRET = old

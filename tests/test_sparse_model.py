"""Sparse (padded-COO) bipartite path vs the dense-mask path."""

import dataclasses

import jax
import numpy as np
import pytest

from dream_gnn_tpu.config import TrainConfig
from dream_gnn_tpu.data.loader import DreamDataset
from dream_gnn_tpu.data.synthetic import synthetic_raw_data
from dream_gnn_tpu.graph.bipartite_coo import (build_enc_graph_coo,
                                               synthetic_bipartite_coo)
from dream_gnn_tpu.model.dream_gnn import forward, init_params
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
    return dataset, model_cfg, params


def test_coo_enc_matches_dense_forward(setup):
    dataset, model_cfg, params = setup
    inputs, _, _, _ = fold_inputs(dataset, 0)
    split = dataset.splits[0]

    coo_graph = build_enc_graph_coo(split.train_pairs, split.train_values,
                                    dataset.n_drug, dataset.n_dis)
    # Norm vectors must agree with the dense builder.
    np.testing.assert_allclose(np.asarray(coo_graph.ci_drug),
                               np.asarray(inputs.enc_graph.ci_drug),
                               rtol=1e-6)

    sparse_inputs = dataclasses.replace(inputs, enc_graph=coo_graph)
    dense_out = forward(params, inputs, model_cfg, train=False)
    sparse_out = forward(params, sparse_inputs, model_cfg, train=False)
    for d, s in zip(dense_out, sparse_out):
        np.testing.assert_allclose(np.asarray(s), np.asarray(d),
                                   rtol=2e-4, atol=2e-5)


def test_coo_train_step_runs(setup):
    """Full train step (augmentation included) on the sparse layout."""
    from dream_gnn_tpu.train.optim import make_optimizer
    from dream_gnn_tpu.train.step import TrainState, make_one_step

    dataset, model_cfg, params = setup
    cfg = TrainConfig()
    inputs, _, labels, _ = fold_inputs(dataset, 0)
    split = dataset.splits[0]
    coo_graph = build_enc_graph_coo(split.train_pairs, split.train_values,
                                    dataset.n_drug, dataset.n_dis)
    sparse_inputs = dataclasses.replace(inputs, enc_graph=coo_graph)

    tx = make_optimizer(cfg.train_grad_clip, cfg.weight_decay)
    one_step = make_one_step(model_cfg, cfg, tx)
    state = TrainState(params=params, opt_state=tx.init(params),
                       key=jax.random.key(1),
                       lr=jax.numpy.asarray(cfg.train_lr))
    state, loss1 = jax.jit(one_step)(state, sparse_inputs, labels)
    state, loss2 = jax.jit(one_step)(state, sparse_inputs, labels)
    assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))
    assert float(loss1) != float(loss2)


def test_synthetic_scale_graph():
    g = synthetic_bipartite_coo(n_drug=500, n_dis=400, n_edges=5000, seed=2)
    assert g.n_drug == 500 and g.n_dis == 400
    total = sum(int((gg.val != 0).sum()) for gg in g.fwd)
    assert total == 5000
    # Norms: 1/sqrt(total incident edges); exclude padding (val == 0).
    deg0 = sum(int((((np.asarray(gg.src) == 0) &
                     (np.asarray(gg.val) != 0)).sum())) for gg in g.fwd)
    ci = np.asarray(g.ci_drug)[0, 0]
    if deg0 > 0:
        assert ci == pytest.approx(1.0 / np.sqrt(deg0), rel=1e-5)

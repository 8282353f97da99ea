"""Activation-level parity: dense-matmul TPU model vs the per-edge
NumPy oracle (tests/reference_numpy.py).

BASELINE.json requires the rebuild to "match the reference DGL
implementation's per-layer activations (allclose)"; the oracle encodes
the reference semantics with literal gather/scatter, so agreement here
proves the dense-mask reformulation exact.
"""

import dataclasses

import jax
import numpy as np
import pytest

import tests.reference_numpy as ref
from dream_gnn_tpu.config import ModelConfig
from dream_gnn_tpu.data.loader import DreamDataset
from dream_gnn_tpu.data.synthetic import synthetic_raw_data
from dream_gnn_tpu.model.dream_gnn import ModelInputs, forward, init_params
from dream_gnn_tpu.train.loop import derive_model_cfg, fold_inputs
from dream_gnn_tpu.config import TrainConfig


@pytest.fixture(scope="module")
def small_setup():
    raw = synthetic_raw_data(n_drug=37, n_dis=23, n_pos=80, seed=7)
    dataset = DreamDataset(raw, k=4, pad_folds=False)
    cfg = TrainConfig()
    model_cfg = dataclasses.replace(
        derive_model_cfg(cfg, dataset),
        # Smaller dims keep the oracle fast; structure unchanged.
        gcn_agg_units=96, gcn_out_units=16, nhid1=32, nhid2=16)
    params = init_params(jax.random.key(0), model_cfg)
    return raw, dataset, model_cfg, params


def _np_params(params):
    return jax.tree.map(np.asarray, params)


@pytest.mark.parametrize("cv", [0, 3])
def test_forward_matches_oracle(small_setup, cv):
    raw, dataset, model_cfg, params = small_setup
    train_inputs, _, train_labels, _ = fold_inputs(dataset, cv)
    split = dataset.splits[cv]

    ours = forward(params, train_inputs, model_cfg, train=False)
    pred, drug_out, drug_sim_out, dis_out, dis_sim_out = [
        np.asarray(x) for x in ours]

    enc = ref.EncGraphNP(split.train_pairs, split.train_values,
                         raw.n_drug, raw.n_dis, symm=True)
    exp = ref.net_forward(
        _np_params(params),
        enc=enc,
        dec_src=split.train_pairs[0], dec_dst=split.train_pairs[1],
        drug_adj=np.asarray(dataset.drug_graph.a),
        drug_sim_feat=np.asarray(dataset.drug_sim_feat),
        drug_feat=np.asarray(dataset.drug_feat),
        dis_adj=np.asarray(dataset.dis_graph.a),
        dis_sim_feat=np.asarray(dataset.dis_sim_feat),
        dis_feat=np.asarray(dataset.dis_feat),
        drug_feat_adj=np.asarray(dataset.drug_feature_graph.a),
        dis_feat_adj=np.asarray(dataset.dis_feature_graph.a),
        layers=model_cfg.layers, share_param=model_cfg.share_param)
    exp_pred, exp_drug_out, exp_drug_sim, exp_dis_out, exp_dis_sim = exp

    np.testing.assert_allclose(drug_out, exp_drug_out, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(dis_out, exp_dis_out, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(drug_sim_out, exp_drug_sim, rtol=2e-4,
                               atol=2e-5)
    np.testing.assert_allclose(dis_sim_out, exp_dis_sim, rtol=2e-4,
                               atol=2e-5)
    np.testing.assert_allclose(pred, exp_pred, rtol=5e-4, atol=5e-5)


def test_effective_msg_units():
    """1024 // 3 == 341 at layer 0 under defaults (§7.3.6)."""
    cfg = ModelConfig()
    assert cfg.effective_msg_units(0) == 341
    assert cfg.effective_msg_units(1) == 128
    assert cfg.effective_msg_units(2) == 128
    stack = dataclasses.replace(cfg, gcn_agg_accum="stack")
    assert stack.effective_msg_units(0) == 1024 // 2 // 3


def test_shared_attention_instance(small_setup):
    """One Attention module serves drugs and diseases (§7.3.7) —
    structurally guaranteed here; assert params are a single subtree."""
    _, _, _, params = small_setup
    assert "attention" in params and "attention_dis" not in params


def test_eval_deterministic(small_setup):
    raw, dataset, model_cfg, params = small_setup
    train_inputs, _, _, _ = fold_inputs(dataset, 0)
    p1, *_ = forward(params, train_inputs, model_cfg, train=False)
    p2, *_ = forward(params, train_inputs, model_cfg, train=False)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


def test_eval_uses_test_encoder_graph(small_setup):
    """Parity trap §7.3.1: test-set evaluation must run message passing
    on the TEST encoder graph (built from test pairs + labels), not the
    train graph (train.py:203-204, evaluation.py:33)."""
    import dataclasses as dc

    raw, dataset, model_cfg, params = small_setup
    train_inputs, test_inputs, _, test_labels = fold_inputs(dataset, 0)

    # The wiring: test_inputs carries the test enc graph.
    assert test_inputs.enc_graph is dataset.fold(0).test_enc
    a1_train = np.asarray(train_inputs.enc_graph.a1)
    a1_test = np.asarray(test_inputs.enc_graph.a1)
    assert not np.array_equal(a1_train, a1_test)
    # Union of fold masks partitions all pairs.
    total = np.asarray(train_inputs.enc_graph.mask) + \
        np.asarray(test_inputs.enc_graph.mask)
    np.testing.assert_array_equal(total, np.ones_like(total))

    # Scores genuinely differ between the two encoder graphs.
    p_test, *_ = forward(params, test_inputs, model_cfg, train=False)
    swapped = dc.replace(test_inputs, enc_graph=train_inputs.enc_graph)
    p_swap, *_ = forward(params, swapped, model_cfg, train=False)
    assert not np.allclose(np.asarray(p_test), np.asarray(p_swap))

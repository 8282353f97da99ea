"""Fused eval interval == separate run_steps + evaluate calls."""

import jax
import numpy as np

from dream_gnn_tpu.config import ModelConfig, TrainConfig
from dream_gnn_tpu.data.loader import DreamDataset
from dream_gnn_tpu.data.synthetic import synthetic_raw_data
from dream_gnn_tpu.model.dream_gnn import init_params
from dream_gnn_tpu.train.loop import derive_model_cfg, fold_inputs
from dream_gnn_tpu.train.step import make_train_fns


def test_run_interval_matches_separate_calls():
    raw = synthetic_raw_data(n_drug=30, n_dis=20, n_pos=50, seed=12)
    dataset = DreamDataset(raw, k=3)
    cfg = TrainConfig(model=ModelConfig(layers=2, gcn_agg_units=48,
                                        gcn_out_units=16, nhid1=24,
                                        nhid2=16))
    model_cfg = derive_model_cfg(cfg, dataset)
    init_state, run_steps, evaluate, run_interval = make_train_fns(
        model_cfg, cfg)
    tr_in, te_in, tr_lab, te_lab = fold_inputs(dataset, 0)
    params = init_params(jax.random.key(0), model_cfg)

    # Independent buffer copies: run_steps/run_interval donate their
    # state, and both states would otherwise share the params arrays.
    s1 = init_state(jax.tree.map(jax.numpy.copy, params),
                    jax.random.key(1))
    s2 = init_state(jax.tree.map(jax.numpy.copy, params),
                    jax.random.key(1))

    s1, losses = run_steps(s1, tr_in, tr_lab, 25)
    tr_auroc, tr_aupr, _ = evaluate(s1.params, tr_in, tr_lab)
    te_auroc, te_aupr, _ = evaluate(s1.params, te_in, te_lab)

    s2, metrics = run_interval(s2, tr_in, tr_lab, te_in, te_lab, 25)
    loss2, tra2, trp2, tea2, tep2 = [float(x) for x in metrics]

    assert float(losses[-1]) == loss2
    assert float(tr_auroc) == tra2
    assert float(tr_aupr) == trp2
    assert float(te_auroc) == tea2
    assert float(te_aupr) == tep2
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

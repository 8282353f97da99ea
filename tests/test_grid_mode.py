"""Grid decode mode must match edge-list mode: same metrics at the
same params (eval is exact), same loss trajectory when dropout is off
(training streams then coincide), same artifacts."""

import dataclasses

import jax
import numpy as np
import pytest

from dream_gnn_tpu.config import ModelConfig, TrainConfig
from dream_gnn_tpu.data.loader import DreamDataset
from dream_gnn_tpu.data.synthetic import synthetic_raw_data
from dream_gnn_tpu.model.dream_gnn import init_params
from dream_gnn_tpu.train.loop import derive_model_cfg, fold_inputs
from dream_gnn_tpu.train.step import make_train_fns


@pytest.fixture(scope="module")
def setup():
    raw = synthetic_raw_data(n_drug=24, n_dis=16, n_pos=48, seed=5)
    dataset = DreamDataset(raw, k=3)
    model = ModelConfig(layers=2, gcn_agg_units=24, gcn_out_units=8,
                        nhid1=16, nhid2=8, decoder_backend="xla")
    cfg = TrainConfig(model=model, rng_impl="threefry2x32")
    model_cfg = derive_model_cfg(cfg, dataset)
    return dataset, cfg, model_cfg


def test_eval_metrics_match_edge_mode(setup):
    """Eval forward is deterministic, so AUROC/AUPR must be identical
    between modes at the same params (same scored cell multiset)."""
    dataset, cfg, model_cfg = setup
    grid_cfg = dataclasses.replace(model_cfg, decode_mode="grid")
    params = init_params(jax.random.key(0), model_cfg)

    _, _, ev_edges, _ = make_train_fns(model_cfg, cfg)
    _, _, ev_grid, _ = make_train_fns(grid_cfg, cfg)

    for cv in (0, 1):
        train_in, test_in, train_lab, test_lab = fold_inputs(dataset, cv)
        fold = dataset.fold(cv)
        for inputs, labels, w in ((train_in, train_lab, fold.train_w),
                                  (test_in, test_lab, fold.test_w)):
            roc_e, pr_e, _ = ev_edges(params, inputs, labels, w)
            roc_g, pr_g, _ = ev_grid(params, inputs, labels, w)
            assert float(roc_g) == pytest.approx(float(roc_e), abs=1e-6)
            assert float(pr_g) == pytest.approx(float(pr_e), abs=1e-6)


def test_train_loss_matches_edge_mode_without_dropout(setup):
    """With dropout off, both modes draw the same augmentation keys and
    the loss over the same cell set must match step for step."""
    dataset, cfg, model_cfg = setup
    nd_cfg = dataclasses.replace(model_cfg, dropout=0.0,
                                 attention_dropout=0.0)
    grid_cfg = dataclasses.replace(nd_cfg, decode_mode="grid")

    train_in, _, train_lab, _ = fold_inputs(dataset, 0)
    w = dataset.fold(0).train_w
    params = init_params(jax.random.key(1), nd_cfg)
    key = jax.random.key(2, impl=cfg.rng_impl)

    init_e, steps_e, *_ = make_train_fns(nd_cfg, cfg)
    init_g, steps_g, *_ = make_train_fns(grid_cfg, cfg)
    # run_steps donates its state, so the two states must not share any
    # buffers — params OR key (same trap as tests/test_run_interval.py).
    st_e = init_e(jax.tree.map(jax.numpy.copy, params),
                  jax.random.clone(key))
    st_g = init_g(jax.tree.map(jax.numpy.copy, params),
                  jax.random.clone(key))
    st_e, losses_e = steps_e(st_e, train_in, train_lab, 5, w)
    st_g, losses_g = steps_g(st_g, train_in, train_lab, 5, w)
    np.testing.assert_allclose(np.asarray(losses_g), np.asarray(losses_e),
                               rtol=2e-4)


def test_grid_mode_trains(setup, tmp_path):
    """Full train_fold in grid mode produces the artifact contract and
    finite, improving metrics."""
    dataset, cfg, model_cfg = setup
    grid_cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, decode_mode="grid"))
    run_cfg = dataclasses.replace(grid_cfg, train_max_iter=11,
                                  train_valid_interval=5)
    from dream_gnn_tpu.train.loop import train_fold

    res = train_fold(dataset, 0, run_cfg, jax.random.key(3, impl="rbg"),
                     save_dir=str(tmp_path), save_id=1, verbose=False)
    assert np.isfinite(res["best_auroc"]) and res["best_aupr"] >= 0
    assert (tmp_path / "test_metric1.csv").exists()
    assert (tmp_path / "best_metric1.csv").exists()

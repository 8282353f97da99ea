"""End-to-end training smoke tests on a small synthetic dataset."""

import dataclasses

import jax
import numpy as np
import pytest

from dream_gnn_tpu.config import ModelConfig, TrainConfig
from dream_gnn_tpu.data.loader import DreamDataset
from dream_gnn_tpu.data.synthetic import synthetic_raw_data
from dream_gnn_tpu.train.loop import train_fold


@pytest.fixture(scope="module")
def tiny_cfg():
    model = ModelConfig(layers=2, gcn_agg_units=96, gcn_out_units=32,
                        nhid1=64, nhid2=32)
    return TrainConfig(train_max_iter=121, train_valid_interval=40,
                       model=model, save_model=True)


@pytest.fixture(scope="module")
def tiny_dataset():
    raw = synthetic_raw_data(n_drug=60, n_dis=45, n_pos=150, seed=11)
    return DreamDataset(raw, k=4)


def test_train_fold_runs_and_learns(tiny_dataset, tiny_cfg, tmp_path_factory):
    save_dir = str(tmp_path_factory.mktemp("run"))
    res = train_fold(tiny_dataset, 0, tiny_cfg, jax.random.key(0),
                     save_dir=save_dir, save_id=1, verbose=False)
    assert 0.0 <= res["best_aupr"] <= 1.0
    assert res["best_auroc"] > 0.5  # planted structure must be learnable
    assert res["best_params"] is not None

    import os
    assert os.path.exists(os.path.join(save_dir, "test_metric1.csv"))
    assert os.path.exists(os.path.join(save_dir, "best_metric1.csv"))
    with open(os.path.join(save_dir, "test_metric1.csv")) as f:
        lines = f.read().strip().split("\n")
    assert lines[0] == "iter,loss,train_auroc,train_aupr,test_auroc,test_aupr"
    # evals at 40, 80, 120 (120 iterations = max_iter - 1)
    assert len(lines) == 4


def test_loss_decreases(tiny_dataset, tiny_cfg):
    res = train_fold(tiny_dataset, 1, tiny_cfg, jax.random.key(1),
                     verbose=False)
    init_state, run_steps, evaluate, _ = res["train_fns"]
    # Re-run first chunk fresh and compare early vs late losses.
    from dream_gnn_tpu.model.dream_gnn import init_params
    from dream_gnn_tpu.train.loop import fold_inputs
    params = init_params(jax.random.key(5), res["model_cfg"])
    state = init_state(params, jax.random.key(6))
    tr_in, _, tr_lab, _ = fold_inputs(tiny_dataset, 1)
    state, losses = run_steps(state, tr_in, tr_lab, 40)
    assert float(losses[-5:].mean()) < float(losses[:5].mean())


def test_determinism(tiny_dataset, tiny_cfg):
    """Same key -> bit-identical result (JAX functional PRNG; the
    reference only offers cudnn.deterministic)."""
    r1 = train_fold(tiny_dataset, 2, tiny_cfg, jax.random.key(3),
                    verbose=False)
    r2 = train_fold(tiny_dataset, 2, tiny_cfg, jax.random.key(3),
                    verbose=False, train_fns=r1["train_fns"])
    assert r1["best_aupr"] == r2["best_aupr"]
    assert r1["best_auroc"] == r2["best_auroc"]


def test_harness_artifacts(tiny_dataset, tiny_cfg, tmp_path_factory):
    from dream_gnn_tpu.train.harness import run_experiments

    save_dir = str(tmp_path_factory.mktemp("harness"))
    cfg = dataclasses.replace(tiny_cfg, save_dir=save_dir,
                              train_max_iter=41, save_model=False)
    summary = run_experiments(tiny_dataset, cfg, seeds=[77, 42],
                              folds=[0, 1], verbose=False)
    assert len(summary["results"]) == 2
    import os
    assert os.path.exists(os.path.join(save_dir, "summary_results.csv"))
    assert os.path.exists(os.path.join(save_dir, "seed_77",
                                       "experiment_results.csv"))
    assert 0.0 <= summary["mean_auroc"] <= 1.0

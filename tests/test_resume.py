"""Checkpoint/resume: restart must reproduce the uninterrupted run."""

import dataclasses

import jax
import numpy as np

from dream_gnn_tpu.config import ModelConfig, TrainConfig
from dream_gnn_tpu.data.loader import DreamDataset
from dream_gnn_tpu.data.synthetic import synthetic_raw_data
from dream_gnn_tpu.eval.novel import get_top_novel_predictions
from dream_gnn_tpu.train.loop import train_fold


def _cfg(**kw):
    model = ModelConfig(layers=2, gcn_agg_units=48, gcn_out_units=16,
                        nhid1=32, nhid2=16)
    return TrainConfig(train_max_iter=81, train_valid_interval=20,
                       model=model, **kw)


def test_resume_reproduces_run(tmp_path):
    raw = synthetic_raw_data(n_drug=40, n_dis=30, n_pos=80, seed=9)
    dataset = DreamDataset(raw, k=3)
    d1, d2 = str(tmp_path / "full"), str(tmp_path / "resumed")

    # Uninterrupted run, checkpointing every eval.
    cfg = _cfg(checkpoint_every=20)
    full = train_fold(dataset, 0, cfg, jax.random.key(0), save_dir=d1,
                      save_id=1, verbose=False)

    # Partial run to iter 40, then resume to the end.
    cfg_half = dataclasses.replace(cfg, train_max_iter=41)
    train_fold(dataset, 0, cfg_half, jax.random.key(0), save_dir=d2,
               save_id=1, verbose=False, train_fns=full["train_fns"])
    resumed = train_fold(dataset, 0, cfg, jax.random.key(0), save_dir=d2,
                         save_id=1, verbose=False,
                         train_fns=full["train_fns"],
                         resume_from=f"{d2}/ckpt_fold1.npz")

    # Same state stream -> identical final params.
    for a, b in zip(jax.tree.leaves(full["final_state"].params),
                    jax.tree.leaves(resumed["final_state"].params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_novel_predictions(tmp_path):
    raw = synthetic_raw_data(n_drug=25, n_dis=18, n_pos=40, seed=10)
    dataset = DreamDataset(raw, k=3)
    cfg = _cfg(save_model=True)
    res = train_fold(dataset, 0, cfg, jax.random.key(1), verbose=False)

    path = str(tmp_path / "top.csv")
    rows = get_top_novel_predictions(res["best_params"], res["model_cfg"],
                                     dataset, 0, top_k=10, save_path=path)
    assert len(rows) == 10
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(0.0 <= s <= 1.0 for s in scores)         # sigmoid applied
    assoc = np.asarray(raw.association)
    for r in rows:                                      # zero cells only
        assert assoc[r["drug_id"], r["disease_id"]] == 0
        assert r["drug_name"].startswith("DB")
    with open(path) as f:
        lines = f.read().strip().split("\n")
    assert len(lines) == 11

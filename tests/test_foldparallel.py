"""Fold-parallel (vmapped) training must reproduce the sequential path.

The stacked runner (train/stacked.py) uses the exact per-fold PRNG keys
the sequential harness derives (``fold_in(seed_key, cv)``), so with the
XLA decoder backend its per-fold metric trajectories must match a
sequential ``train_fold`` run up to vmap-batching float reassociation.
"""

import dataclasses
import glob
import os

import jax
import numpy as np
import pytest

from dream_gnn_tpu.config import ModelConfig, TrainConfig
from dream_gnn_tpu.data.loader import DreamDataset
from dream_gnn_tpu.data.synthetic import synthetic_raw_data
from dream_gnn_tpu.sharding.foldstack import stack_folds
from dream_gnn_tpu.train.loop import derive_model_cfg
from dream_gnn_tpu.train.stacked import (make_stacked_train_fns,
                                         train_seed_foldparallel)


@pytest.fixture(scope="module")
def setup():
    raw = synthetic_raw_data(n_drug=24, n_dis=16, n_pos=48, seed=3)
    dataset = DreamDataset(raw, k=3)
    model = ModelConfig(layers=2, gcn_agg_units=24, gcn_out_units=8,
                        nhid1=16, nhid2=8, decoder_backend="xla")
    # threefry is vmap-invariant, so stacked == sequential sample-for-
    # sample; the default rbg impl is only statistically equivalent
    # under vmap (batched RngBitGenerator draws a different stream for
    # batch indices > 0).
    cfg = TrainConfig(model=model, train_max_iter=11,
                      train_valid_interval=5, rng_impl="threefry2x32")
    model_cfg = derive_model_cfg(cfg, dataset)
    return dataset, cfg, model_cfg


def test_stack_folds_test_side(setup):
    dataset, cfg, model_cfg = setup
    tr = stack_folds(dataset, [0, 1, 2], side="train")
    te = stack_folds(dataset, [0, 1, 2], side="test")
    assert tr.labels.shape[0] == te.labels.shape[0] == 3
    # Test side must carry the *test* encoder graph (parity trap §7.3.1):
    # fewer in-fold pairs than the train graph.
    assert (np.asarray(te.inputs.enc_graph.mask).sum()
            < np.asarray(tr.inputs.enc_graph.mask).sum())
    # Real (unpadded) edge mass equals the fold's candidate count.
    for i, cv in enumerate([0, 1, 2]):
        fold = dataset.fold(cv)
        expect = (float(np.asarray(fold.test_w).sum())
                  if fold.test_w is not None
                  else float(fold.test_labels.shape[0]))
        assert float(np.asarray(te.edge_weight[i]).sum()) == expect


def test_stacked_matches_sequential(setup, tmp_path):
    dataset, cfg, model_cfg = setup
    seed_key = jax.random.key(123, impl=cfg.rng_impl)
    folds = [0, 1, 2]

    seq_dir = tmp_path / "seq"
    from dream_gnn_tpu.train.loop import train_fold

    seq_results = []
    train_fns = None
    for cv in folds:
        res = train_fold(dataset, cv, cfg,
                         jax.random.fold_in(seed_key, cv),
                         save_dir=str(seq_dir), save_id=cv + 1,
                         verbose=False, train_fns=train_fns)
        train_fns = res["train_fns"]
        seq_results.append(res)

    par_dir = tmp_path / "par"
    par_results, _ = train_seed_foldparallel(
        dataset, cfg, seed_key, folds, save_dir=str(par_dir),
        verbose=False)

    for cv, (s, p) in enumerate(zip(seq_results, par_results)):
        assert p["best_auroc"] == pytest.approx(s["best_auroc"], abs=2e-4)
        assert p["best_aupr"] == pytest.approx(s["best_aupr"], abs=2e-4)
        seq_csv = np.genfromtxt(seq_dir / f"test_metric{cv + 1}.csv",
                                delimiter=",", names=True)
        par_csv = np.genfromtxt(par_dir / f"test_metric{cv + 1}.csv",
                                delimiter=",", names=True)
        for name in seq_csv.dtype.names:
            np.testing.assert_allclose(
                np.atleast_1d(par_csv[name]), np.atleast_1d(seq_csv[name]),
                atol=2e-4, err_msg=f"fold {cv} column {name}")

    # Artifact contract: same files as the sequential path.
    assert sorted(os.path.basename(f) for f in glob.glob(
        str(par_dir / "*.csv"))) == sorted(
        os.path.basename(f) for f in glob.glob(str(seq_dir / "*.csv")))


def test_stacked_pallas_backend(setup):
    """The stacked path with decoder_backend='pallas' dispatches to the
    fold-batched fused kernel (interpret mode on CPU; dropout must be 0
    because the on-core PRNG has no CPU interpret rule)."""
    import dream_gnn_tpu.kernels.pallas_decoder as pd

    dataset, cfg, model_cfg = setup
    pallas_cfg = dataclasses.replace(model_cfg, decoder_backend="pallas",
                                     dropout=0.0)
    fns = make_stacked_train_fns(pallas_cfg, cfg)
    tr = stack_folds(dataset, [0, 1], side="train")
    te = stack_folds(dataset, [0, 1], side="test")
    keys = jax.numpy.stack([
        jax.random.fold_in(jax.random.key(0, impl=cfg.rng_impl), cv)
        for cv in [0, 1]])
    old = pd.INTERPRET
    pd.INTERPRET = True
    try:
        state = fns[0](keys)
        state, metrics = fns[2](state, tr, te, 3)
        metrics = np.asarray(metrics)
    finally:
        pd.INTERPRET = old
    assert metrics.shape == (2, 5)
    assert np.isfinite(metrics).all()


def test_seed_parallel_matches_per_seed(setup, tmp_path):
    """Seed-parallel stacking (S x F items in one compiled batch,
    train_stacked_protocol) reproduces per-seed fold-parallel runs
    sample-for-sample under threefry, artifacts included."""
    from dream_gnn_tpu.train.stacked import train_stacked_protocol

    dataset, cfg, model_cfg = setup
    folds = [0, 1]
    keys = [jax.random.key(s, impl=cfg.rng_impl) for s in (7, 8)]

    sp_dirs = [str(tmp_path / f"sp_seed{s}") for s in (7, 8)]
    per_seed, _ = train_stacked_protocol(
        dataset, cfg, keys, folds, save_dirs=sp_dirs, verbose=False,
        model_cfg=model_cfg)
    assert len(per_seed) == 2 and len(per_seed[0]) == 2

    for key, sp_res, sp_dir, s in zip(keys, per_seed, sp_dirs, (7, 8)):
        ref_dir = str(tmp_path / f"ref_seed{s}")
        ref_res, _ = train_seed_foldparallel(
            dataset, cfg, key, folds, save_dir=ref_dir, verbose=False,
            model_cfg=model_cfg)
        for a, b in zip(sp_res, ref_res):
            assert a["best_aupr"] == pytest.approx(b["best_aupr"],
                                                   rel=1e-4)
            assert a["best_auroc"] == pytest.approx(b["best_auroc"],
                                                    rel=1e-4)
        for cv in folds:
            fa = os.path.join(sp_dir, f"test_metric{cv + 1}.csv")
            fb = os.path.join(ref_dir, f"test_metric{cv + 1}.csv")
            ra = open(fa).read().splitlines()
            rb = open(fb).read().splitlines()
            assert ra[0] == rb[0]
            for la, lb in zip(ra[1:], rb[1:]):
                va = np.asarray([float(x) for x in la.split(",")])
                vb = np.asarray([float(x) for x in lb.split(",")])
                np.testing.assert_allclose(va, vb, rtol=2e-3, atol=2e-3)

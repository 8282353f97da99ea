"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dream_gnn_tpu.config import ModelConfig, TrainConfig
from dream_gnn_tpu.data.loader import DreamDataset
from dream_gnn_tpu.data.synthetic import synthetic_raw_data
from dream_gnn_tpu.sharding.foldstack import stack_folds
from dream_gnn_tpu.sharding.mesh import make_mesh
from dream_gnn_tpu.sharding.partition import (make_multichip_train_step,
                                              shard_stacked)
from dream_gnn_tpu.train.loop import derive_model_cfg


@pytest.fixture(scope="module")
def setup():
    raw = synthetic_raw_data(n_drug=24, n_dis=16, n_pos=48, seed=1)
    dataset = DreamDataset(raw, k=3, pad_folds=False)
    model = ModelConfig(layers=2, gcn_agg_units=24, gcn_out_units=8,
                        nhid1=16, nhid2=8)
    cfg = TrainConfig(model=model)
    model_cfg = dataclasses.replace(derive_model_cfg(cfg, dataset),
                                    layers=2, gcn_agg_units=24,
                                    gcn_out_units=8, nhid1=16, nhid2=8)
    return dataset, cfg, model_cfg


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


# (4, 2) is exercised by test_multichip_interval_matches_unsharded;
# keep the two extreme mesh shapes here (each combo is ~25 s of
# virtual-mesh compile time).
@pytest.mark.parametrize("dp,mp", [(8, 1), (2, 4)])
def test_multichip_step_runs(setup, dp, mp):
    dataset, cfg, model_cfg = setup
    mesh = make_mesh(dp=dp, mp=mp)
    stacked = shard_stacked(mesh, stack_folds(dataset, list(range(dp)),
                                              pad_multiple=mp * 32))
    init_state, step = make_multichip_train_step(mesh, model_cfg, cfg)
    state = init_state(jax.random.key(0), dp)
    state, losses = step(state, stacked)
    losses = np.asarray(losses)
    assert losses.shape == (dp,)
    assert np.isfinite(losses).all()
    # A second step must change the loss (params actually update).
    _, losses2 = step(state, stacked)
    assert not np.array_equal(losses, np.asarray(losses2))


def test_sharded_matches_single_device(setup):
    """dp x mp sharding must not change the math: compare one sharded
    fold step against the plain single-device step."""
    from dream_gnn_tpu.train.step import make_train_fns
    from dream_gnn_tpu.train.loop import fold_inputs

    dataset, cfg, model_cfg = setup
    # Exact comparison requires removing shape-dependent randomness:
    # augmentation off and dropout 0 (padded edge lists draw different
    # dropout masks otherwise).
    model_det = dataclasses.replace(model_cfg, dropout=0.0,
                                    attention_dropout=0.0)
    cfg_det = dataclasses.replace(
        cfg, augment=dataclasses.replace(cfg.augment, methods=()))

    mesh = make_mesh(dp=2, mp=2)
    stacked = shard_stacked(mesh, stack_folds(dataset, [0, 1],
                                              pad_multiple=64))
    init_state, step = make_multichip_train_step(mesh, model_det, cfg_det)
    state = init_state(jax.random.key(0), 2)
    sharded_state, sharded_losses = step(state, stacked)

    init_single, run_steps, *_ = make_train_fns(model_det, cfg_det)
    for i, cv in enumerate([0, 1]):
        tr_in, _, tr_lab, _ = fold_inputs(dataset, cv)
        params_i = jax.tree.map(lambda x: x[i], state.params)
        single = init_single(params_i, jax.tree.map(lambda x: x[i],
                                                    state.key))
        _, losses = run_steps(single, tr_in, tr_lab, 1)
        np.testing.assert_allclose(float(losses[0]),
                                   float(sharded_losses[i]),
                                   rtol=1e-4, atol=1e-5)


# Slow tier (r5): ~80 s, and the round driver independently executes
# __graft_entry__.dryrun_multichip every round (MULTICHIP_r*.json), so
# the default tier was paying twice for the same check.
@pytest.mark.slow
def test_graft_dryrun():
    # ring_shards=2: the S=4 ring is the driver's job (MULTICHIP_r*);
    # tests/test_sharded_scale.py pins S=2 ring numerics — here we only
    # need the dryrun plumbing to run end-to-end inside the budget.
    import __graft_entry__ as graft

    graft.dryrun_multichip(8, ring_shards=2)


def test_multihost_helpers_single_process():
    from dream_gnn_tpu.sharding import multihost

    multihost.initialize()          # no-op in single-process tests
    mesh = multihost.global_mesh(mp=2)
    assert mesh.devices.size == 8
    s = multihost.local_shard_slice(10)
    assert s == slice(0, 10)


def test_multichip_interval_matches_unsharded(setup):
    """The mesh-sharded fold-parallel interval (scan + evals in one
    dispatch) must reproduce the single-device stacked run — threefry
    keys so the streams are sharding-invariant."""
    import jax.numpy as jnp

    from dream_gnn_tpu.sharding.partition import (make_multichip_train_fns,
                                                  shard_stacked)
    from dream_gnn_tpu.train.stacked import make_stacked_train_fns

    dataset, cfg, model_cfg = setup
    cfg = dataclasses.replace(cfg, rng_impl="threefry2x32")
    folds = [0, 1, 2, 3]
    keys = jnp.stack([jax.random.fold_in(
        jax.random.key(5, impl=cfg.rng_impl), cv) for cv in folds])

    tr = stack_folds(dataset, folds, pad_multiple=64, side="train")
    te = stack_folds(dataset, folds, pad_multiple=64, side="test")
    ref_fns = make_stacked_train_fns(
        dataclasses.replace(model_cfg, decoder_backend="xla"), cfg)
    ref_state = ref_fns[0](keys)
    ref_state, ref_metrics = ref_fns[2](ref_state, tr, te, 4)
    ref_metrics = np.asarray(ref_metrics)

    mesh = make_mesh(dp=4, mp=2)
    fns = make_multichip_train_fns(mesh, model_cfg, cfg)
    state = fns[0](keys)
    tr_s = shard_stacked(mesh, stack_folds(dataset, folds,
                                           pad_multiple=64, side="train"))
    te_s = shard_stacked(mesh, stack_folds(dataset, folds,
                                           pad_multiple=64, side="test"))
    state, metrics = fns[2](state, tr_s, te_s, 4)
    np.testing.assert_allclose(np.asarray(metrics), ref_metrics,
                               rtol=5e-4, atol=5e-4)

"""Augmentation semantics tests (reference augmentation.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from dream_gnn_tpu.augment.masks import (augment_inputs, edge_dropout_masks,
                                         feature_masking, feature_noise,
                                         graph_noise, mixup_features,
                                         sparse_edge_dropout)
from dream_gnn_tpu.config import AugmentConfig
from dream_gnn_tpu.data.loader import DreamDataset
from dream_gnn_tpu.data.synthetic import synthetic_raw_data
from dream_gnn_tpu.graph.knn import NormAdj
from dream_gnn_tpu.train.loop import fold_inputs


def test_edge_dropout_masks_independent_directions():
    masks = edge_dropout_masks(jax.random.key(0), 30, 20, 2, rate=0.3)
    fwd, rev = np.asarray(masks["fwd"]), np.asarray(masks["rev"])
    assert fwd.shape == rev.shape == (2, 30, 20)
    # Independent draws: fwd != rev with overwhelming probability.
    assert not np.array_equal(fwd, rev)
    # Keep rate ~ 1 - rate.
    assert abs(fwd.mean() - 0.7) < 0.05


def test_sparse_edge_dropout_keeps_stale_values(rng):
    a = np.zeros((20, 20), np.float32)
    idx = rng.random((20, 20)) < 0.3
    a[idx] = rng.random(idx.sum()).astype(np.float32) + 0.1
    out = np.asarray(sparse_edge_dropout(jax.random.key(1), NormAdj(a=jnp.asarray(a)),
                                         rate=0.5).a)
    kept = out != 0
    # Every kept entry keeps its original (stale, not renormalised) value.
    np.testing.assert_array_equal(out[kept], a[kept])
    assert kept.sum() < idx.sum()


def test_feature_noise_scale(rng):
    x = jnp.zeros((200, 50))
    out = np.asarray(feature_noise(jax.random.key(2), x, scale=0.05))
    assert abs(out.std() - 0.05) < 0.005


def test_feature_masking_no_rescale(rng):
    x = jnp.ones((100, 100))
    out = np.asarray(feature_masking(jax.random.key(3), x, rate=0.25))
    # torch-style masking: zeros, survivors unscaled (augmentation.py:295-297)
    assert set(np.unique(out)) == {0.0, 1.0}
    assert abs((out == 0).mean() - 0.25) < 0.03


def test_graph_noise_clamped_nonneg(rng):
    a = np.zeros((15, 15), np.float32)
    a[rng.random((15, 15)) < 0.4] = 0.01
    out = np.asarray(graph_noise(jax.random.key(4), NormAdj(a=jnp.asarray(a)),
                                 scale=0.1).a)
    assert (out >= 0).all()
    assert (out[a == 0] == 0).all()  # noise only on existing edges


def test_mixup_preserves_mean(rng):
    x = jnp.asarray(rng.normal(size=(50, 10)).astype(np.float32))
    out = np.asarray(mixup_features(jax.random.key(5), x, alpha=0.2))
    np.testing.assert_allclose(out.mean(0), np.asarray(x).mean(0),
                               rtol=0.5, atol=0.15)


def test_augment_inputs_default_pipeline():
    raw = synthetic_raw_data(n_drug=20, n_dis=15, n_pos=30, seed=2)
    dataset = DreamDataset(raw, k=3)
    inputs, _, _, _ = fold_inputs(dataset, 0)
    cfg = AugmentConfig()  # edge_dropout + feature_noise

    aug, edge_masks = augment_inputs(jax.random.key(0), inputs, cfg)
    assert edge_masks is not None
    assert edge_masks["fwd"].shape == (2, 20, 15)
    # Features perturbed, similarity graphs edge-dropped.
    assert not np.array_equal(np.asarray(aug.drug_feat),
                              np.asarray(inputs.drug_feat))
    assert not np.array_equal(np.asarray(aug.drug_sim_feat),
                              np.asarray(inputs.drug_sim_feat))
    n_before = (np.asarray(inputs.drug_graph.a) != 0).sum()
    n_after = (np.asarray(aug.drug_graph.a) != 0).sum()
    assert n_after < n_before
    # The encoder graph itself is untouched (masking is applied in the
    # conv); the dec edges are never augmented (train.py:269).
    np.testing.assert_array_equal(np.asarray(aug.enc_graph.a1),
                                  np.asarray(inputs.enc_graph.a1))
    np.testing.assert_array_equal(np.asarray(aug.dec_src),
                                  np.asarray(inputs.dec_src))


def test_augment_inputs_empty_pipeline():
    raw = synthetic_raw_data(n_drug=10, n_dis=8, n_pos=12, seed=3)
    dataset = DreamDataset(raw, k=2)
    inputs, _, _, _ = fold_inputs(dataset, 0)
    cfg = AugmentConfig(methods=())
    aug, edge_masks = augment_inputs(jax.random.key(0), inputs, cfg)
    assert edge_masks is None
    assert aug is inputs


def test_checkpoint_roundtrip(tmp_path):
    from dream_gnn_tpu.train.checkpoint import load_pytree, save_pytree

    tree = {"a": jnp.arange(5.0), "b": [jnp.ones((2, 3)),
                                        {"c": jnp.asarray(2)}]}
    path = str(tmp_path / "ckpt.npz")
    save_pytree(path, tree)
    loaded = load_pytree(path)
    assert jax.tree.structure(loaded) == jax.tree.structure(tree)
    for x, y in zip(jax.tree.leaves(loaded), jax.tree.leaves(tree)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_add_random_edges():
    import jax.numpy as jnp

    from dream_gnn_tpu.model.dream_gnn import forward, init_params
    from dream_gnn_tpu.train.loop import derive_model_cfg
    from dream_gnn_tpu.config import TrainConfig
    import dataclasses as dc

    raw = synthetic_raw_data(n_drug=20, n_dis=15, n_pos=30, seed=6)
    dataset = DreamDataset(raw, k=3)
    inputs, _, _, _ = fold_inputs(dataset, 0)
    cfg = AugmentConfig(methods=("add_random_edges",), add_edge_rate=0.5)
    aug, masks = augment_inputs(jax.random.key(0), inputs, cfg)
    assert masks is not None and "fwd_add" in masks
    assert masks["fwd_add"].shape == (2, 20, 15)
    # ~add_rate * E cells set per rating (loose statistical bound)
    n_e1 = float(np.asarray(inputs.enc_graph.a1).sum())
    got = float(np.asarray(masks["fwd_add"][1]).sum())
    assert 0 < got < 6 * cfg.add_edge_rate * n_e1 + 10

    # Forward runs with addition masks (train mode)
    tc = TrainConfig()
    model_cfg = dc.replace(derive_model_cfg(tc, dataset),
                           layers=2, gcn_agg_units=24, gcn_out_units=8,
                           nhid1=16, nhid2=8)
    params = init_params(jax.random.key(1), model_cfg)
    pred, *_ = forward(params, aug, model_cfg, train=True,
                       key=jax.random.key(2), edge_masks=masks)
    assert np.isfinite(np.asarray(pred)).all()

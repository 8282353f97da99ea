"""SPMD partitioning rules for the fused Pallas decoders.

The multi-chip fold-parallel path used to silently swap the fused
decoders for the XLA lowerings (round-1 VERDICT #3); these tests pin
the shard_map-partitioned kernels (fold axis -> dp, edge/disease dim
-> mp) against the plain XLA decoder on the virtual 8-device mesh —
logits AND gradients — including non-divisible fold/edge/disease
counts (the pad-and-slice path).  Dropout is 0 here: the kernel's
on-core PRNG stream is impl-defined and per-shard decorrelated, so
only the rate/independence are testable (tests/test_dropout_tpu.py).

Replaces reference MLPDecoder + DGL apply_edges (layers.py:341-379,
364) on the multi-chip path at kernel speed.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dream_gnn_tpu.kernels.pallas_decoder as pd
from dream_gnn_tpu.nn.decoder import (decoder_apply, decoder_apply_grid,
                                      decoder_init)
from dream_gnn_tpu.sharding.mesh import make_mesh


@pytest.fixture(scope="module")
def setup():
    f, nd, nv, d, e = 3, 10, 9, 12, 37   # none divisible by dp=4 / mp=2
    keys = jax.random.split(jax.random.key(0), f)
    params = jax.vmap(lambda k: decoder_init(
        k, in_units=d, hidden1=16, hidden2=8))(keys)
    kd, kv, ks, kt = jax.random.split(jax.random.key(1), 4)
    drug_feat = jax.random.normal(kd, (f, nd, d), jnp.float32)
    dis_feat = jax.random.normal(kv, (f, nv, d), jnp.float32)
    src = jax.random.randint(ks, (f, e), 0, nd)
    dst = jax.random.randint(kt, (f, e), 0, nv)
    mesh = make_mesh(dp=4, mp=2)
    return params, drug_feat, dis_feat, src, dst, mesh


def test_spmd_edges_decoder_matches_xla(setup):
    from dream_gnn_tpu.kernels.pallas_decoder_batched import (
        decoder_apply_fused_batched)

    params, drug_feat, dis_feat, src, dst, mesh = setup

    def xla_loss(params):
        logits = jax.vmap(lambda p, s, t, df, vf: decoder_apply(
            p, s, t, df, vf, dropout_rate=0.0, train=False,
            dtype=jnp.float32))(params, src, dst, drug_feat, dis_feat)
        return jnp.sum(jnp.sin(logits)), logits

    def spmd_loss(params):
        logits = decoder_apply_fused_batched(
            params, src, dst, drug_feat, dis_feat, dropout_rate=0.0,
            train=False, dtype=jnp.float32, mesh=mesh)
        return jnp.sum(jnp.sin(logits)), logits

    old = pd.INTERPRET
    pd.INTERPRET = True
    try:
        (_, ref_logits), ref_grads = jax.jit(
            jax.value_and_grad(xla_loss, has_aux=True))(params)
        (_, logits), grads = jax.jit(
            jax.value_and_grad(spmd_loss, has_aux=True))(params)
    finally:
        pd.INTERPRET = old

    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               rtol=1e-5, atol=1e-5)
    for k in ref_grads:
        np.testing.assert_allclose(
            np.asarray(grads[k]), np.asarray(ref_grads[k]),
            rtol=1e-4, atol=1e-5, err_msg=f"grad {k}")


def test_spmd_grid_decoder_matches_xla(setup):
    from dream_gnn_tpu.kernels.pallas_grid_decoder import (
        decoder_apply_grid_fused_batched)

    params, drug_feat, dis_feat, _, _, mesh = setup

    def xla_loss(params):
        logits = jax.vmap(lambda p, df, vf: decoder_apply_grid(
            p, df, vf, dropout_rate=0.0, train=False,
            dtype=jnp.float32))(params, drug_feat, dis_feat)
        return jnp.sum(jnp.sin(logits)), logits

    def spmd_loss(params):
        logits = decoder_apply_grid_fused_batched(
            params, drug_feat, dis_feat, dropout_rate=0.0,
            train=False, dtype=jnp.float32, mesh=mesh)
        return jnp.sum(jnp.sin(logits)), logits

    old = pd.INTERPRET
    pd.INTERPRET = True
    try:
        (_, ref_logits), ref_grads = jax.jit(
            jax.value_and_grad(xla_loss, has_aux=True))(params)
        (_, logits), grads = jax.jit(
            jax.value_and_grad(spmd_loss, has_aux=True))(params)
    finally:
        pd.INTERPRET = old

    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               rtol=1e-5, atol=1e-5)
    for k in ref_grads:
        np.testing.assert_allclose(
            np.asarray(grads[k]), np.asarray(ref_grads[k]),
            rtol=1e-4, atol=1e-5, err_msg=f"grad {k}")


def test_multichip_interval_pallas_matches_xla():
    """The full mesh-sharded interval runner with the fused grid
    decoder must reproduce the XLA-decoder mesh run (dropout 0: the
    kernel PRNG's dropout stream is impl-defined)."""
    from dream_gnn_tpu.config import ModelConfig, TrainConfig
    from dream_gnn_tpu.data.loader import DreamDataset
    from dream_gnn_tpu.data.synthetic import synthetic_raw_data
    from dream_gnn_tpu.sharding.foldstack import stack_folds
    from dream_gnn_tpu.sharding.partition import (make_multichip_train_fns,
                                                  shard_stacked)
    from dream_gnn_tpu.train.loop import derive_model_cfg

    raw = synthetic_raw_data(n_drug=24, n_dis=16, n_pos=48, seed=1)
    dataset = DreamDataset(raw, k=3, pad_folds=False)
    model = ModelConfig(layers=2, gcn_agg_units=24, gcn_out_units=8,
                        nhid1=16, nhid2=8, dropout=0.0,
                        attention_dropout=0.0, decode_mode="grid",
                        compute_dtype="float32")
    cfg = TrainConfig(model=model, rng_impl="threefry2x32")
    model_cfg = dataclasses.replace(
        derive_model_cfg(cfg, dataset), layers=2, gcn_agg_units=24,
        gcn_out_units=8, nhid1=16, nhid2=8)

    # shard_stacked's device_put needs fold count divisible by dp (the
    # GSPMD input contract); non-divisible folds are covered by the
    # kernel-level tests above.
    folds = [0, 1, 2, 3]
    keys = jnp.stack([jax.random.fold_in(
        jax.random.key(5, impl=cfg.rng_impl), cv) for cv in folds])
    mesh = make_mesh(dp=4, mp=2)
    tr = shard_stacked(mesh, stack_folds(dataset, folds, pad_multiple=64,
                                         side="train"))
    te = shard_stacked(mesh, stack_folds(dataset, folds, pad_multiple=64,
                                         side="test"))

    ref_fns = make_multichip_train_fns(
        mesh, dataclasses.replace(model_cfg, decoder_backend="xla"), cfg)
    ref_state = ref_fns[0](keys)
    _, ref_metrics = ref_fns[2](ref_state, tr, te, 3)
    ref_metrics = np.asarray(ref_metrics)

    old = pd.INTERPRET
    pd.INTERPRET = True
    try:
        fns = make_multichip_train_fns(
            mesh, dataclasses.replace(model_cfg, decoder_backend="pallas"),
            cfg)
        state = fns[0](keys)
        _, metrics = fns[2](state, tr, te, 3)
        metrics = np.asarray(metrics)
    finally:
        pd.INTERPRET = old

    np.testing.assert_allclose(metrics, ref_metrics, rtol=5e-4, atol=5e-4)

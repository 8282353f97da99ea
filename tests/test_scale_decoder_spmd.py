"""Candidate-sharded SPMD scale decoder vs the single-device kernel
(CPU interpret, virtual 8-device mesh).

Parity contract (sharding/scale_decoder_spmd.py): sharding the
candidate list over a mesh axis must change NOTHING about the math —
logits per physical candidate, gradients for the decoder params and
both node-feature tables, and (because the PRF dropout masks key on
GLOBAL candidate ids carried in the per-shard layouts) even the
dropout draws are bit-compatible with the unsharded kernel.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dream_gnn_tpu.kernels.pallas_scale_decoder as psd
import dream_gnn_tpu.kernels.pallas_spmm_gather as psg
from dream_gnn_tpu.nn.decoder import decoder_apply, decoder_init
from dream_gnn_tpu.sharding.mesh import make_mesh
from dream_gnn_tpu.sharding.scale_decoder_spmd import (
    build_scale_decoder_layout_sharded, decoder_apply_scale_spmd)


@pytest.fixture(autouse=True)
def _interpret():
    import dream_gnn_tpu.kernels.pallas_seq_scatter as psq
    old, oldg, oldq = psd.INTERPRET, psg.INTERPRET, psq.INTERPRET
    psd.INTERPRET = psg.INTERPRET = psq.INTERPRET = True
    yield
    psd.INTERPRET, psg.INTERPRET, psq.INTERPRET = old, oldg, oldq


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    n_drug, n_dis, e, d = 200, 160, 1021, 16   # e not divisible by S
    params = decoder_init(jax.random.key(0), in_units=d)
    drug_feat = jnp.asarray(rng.normal(size=(n_drug, d)), jnp.float32)
    dis_feat = jnp.asarray(rng.normal(size=(n_dis, d)), jnp.float32)
    src = rng.integers(0, n_drug, e)
    dst = rng.integers(0, n_dis, e)
    labels = jnp.asarray((rng.random(e) < 0.3).astype(np.float32))
    mesh = make_mesh(dp=4, mp=1)
    slay = build_scale_decoder_layout_sharded(src, dst, n_drug, n_dis,
                                              4, mesh=mesh, axis="dp")
    return (params, drug_feat, dis_feat, src, dst, labels, mesh, slay)


def test_forward_matches_xla(setup):
    params, drug_feat, dis_feat, src, dst, _, mesh, slay = setup
    want = decoder_apply(params, jnp.asarray(src), jnp.asarray(dst),
                         drug_feat, dis_feat, dropout_rate=0.0,
                         train=False)
    got = decoder_apply_scale_spmd(
        params, slay, drug_feat, dis_feat, mesh, "dp",
        dropout_rate=0.0, train=False, dtype=jnp.float32)
    assert got.shape == (4, slay.n_pos)
    phys = np.asarray(got).reshape(-1)[slay.global_slot()]
    np.testing.assert_allclose(phys, np.asarray(want), rtol=1e-4,
                               atol=1e-4)


def test_slot_labels_cover_all_candidates(setup):
    labels, slay = setup[5], setup[7]
    lab, w = slay.slot_labels(labels)
    assert lab.shape == w.shape == (4, slay.n_pos)
    # Total weight = number of live candidates; weighted label mass
    # matches the physical labels exactly.
    assert float(jnp.sum(w)) == labels.shape[0]
    assert float(jnp.sum(lab * w)) == pytest.approx(
        float(jnp.sum(labels)))


@pytest.mark.slow
def test_grads_match_single_device_with_dropout(setup):
    """Same seed => the sharded run draws the unsharded run's PRF
    masks (global candidate ids), so losses and EVERY gradient match
    the single-device scale kernel exactly (not just statistically)."""
    params, drug_feat, dis_feat, src, dst, labels, mesh, slay = setup
    layout = psd.build_scale_decoder_layout(src, dst, 200, 160)
    key = jax.random.key(3)
    rate = 0.5

    slab, sw = layout.slot_labels(labels)
    dlab, dw = slay.slot_labels(labels)

    def loss_single(params, drug_feat, dis_feat):
        out = psd.decoder_apply_scale(
            params, layout, drug_feat, dis_feat, dropout_rate=rate,
            train=True, key=key, dtype=jnp.float32)
        return jnp.sum(sw * (out - slab) ** 2)

    def loss_spmd(params, drug_feat, dis_feat):
        out = decoder_apply_scale_spmd(
            params, slay, drug_feat, dis_feat, mesh, "dp",
            dropout_rate=rate, train=True, key=key, dtype=jnp.float32)
        return jnp.sum(dw * (out - dlab) ** 2)

    l1, g1 = jax.value_and_grad(loss_single, argnums=(0, 1, 2))(
        params, drug_feat, dis_feat)
    l2, g2 = jax.value_and_grad(loss_spmd, argnums=(0, 1, 2))(
        params, drug_feat, dis_feat)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    flat1 = jax.tree.leaves(g1)
    flat2 = jax.tree.leaves(g2)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_empty_last_shard_rejected():
    """e=5 over 4 shards ceil-chunks to 2,2,1,0 — the guard must raise
    a clear ValueError up front instead of an obscure IndexError deep
    inside _stream_layout (advisor r4 medium)."""
    with pytest.raises(ValueError, match="last shard empty"):
        build_scale_decoder_layout_sharded(
            np.arange(5), np.arange(5), 10, 10, n_shards=4)


@pytest.mark.slow
def test_uneven_last_shard_padding_is_inert(setup):
    """The last shard owns 1021 - 3*256 = 253 live candidates; its
    padded slots must carry zero weight and produce zero table
    gradient rows for untouched nodes."""
    params, drug_feat, dis_feat, src, dst, labels, mesh, slay = setup
    _, w = slay.slot_labels(labels)
    live = [int(jnp.sum(w[s] > 0)) for s in range(4)]
    assert live == [256, 256, 256, 253]

    untouched = np.setdiff1d(np.arange(200), np.asarray(src))
    if untouched.size:
        def loss(df):
            # train=True so the residual a1 is saved for the backward
            # (eval mode shrinks it away — same as the single-device
            # kernel); rate=0 keeps the math deterministic.
            out = decoder_apply_scale_spmd(
                params, slay, df, dis_feat, mesh, "dp",
                dropout_rate=0.0, train=True, dtype=jnp.float32)
            return jnp.sum(w * out)

        g = jax.grad(loss)(drug_feat)
        np.testing.assert_allclose(
            np.asarray(g)[untouched], 0.0, atol=1e-6)


@pytest.mark.slow
def test_full_model_sharded_encoder_and_decoder():
    """FULL dual-route forward with BOTH scale components sharded on
    one mesh axis — the edge-partitioned encoder (halo exchange) and
    the candidate-sharded scale decoder (model-level dispatch on the
    ShardedScaleDecoderLayout carried in ModelInputs.dec_layout) —
    loss and every parameter gradient pinned against the single-device
    COO + unsharded-scale-layout path."""
    import dataclasses as dc

    from dream_gnn_tpu.config import TrainConfig
    from dream_gnn_tpu.data.loader import DreamDataset
    from dream_gnn_tpu.data.synthetic import synthetic_raw_data
    from dream_gnn_tpu.graph.bipartite_coo import build_enc_graph_coo
    from dream_gnn_tpu.model.dream_gnn import forward, init_params
    from dream_gnn_tpu.sharding.scale_graph import build_enc_graph_sharded
    from dream_gnn_tpu.train.loop import derive_model_cfg, fold_inputs

    raw = synthetic_raw_data(n_drug=30, n_dis=22, n_pos=60, seed=5)
    dataset = DreamDataset(raw, k=3)
    cfg = TrainConfig()
    model_cfg = dc.replace(
        derive_model_cfg(cfg, dataset),
        layers=2, gcn_agg_units=48, gcn_out_units=16, nhid1=24,
        nhid2=16, dropout=0.0, attention_dropout=0.0,
        decoder_backend="pallas")
    params = init_params(jax.random.key(0), model_cfg)
    mesh = make_mesh(dp=4, mp=1)
    inputs, _, labels, _ = fold_inputs(dataset, 0)
    split = dataset.splits[0]
    coo = build_enc_graph_coo(split.train_pairs, split.train_values,
                              dataset.n_drug, dataset.n_dis)
    sharded = build_enc_graph_sharded(
        split.train_pairs, split.train_values, dataset.n_drug,
        dataset.n_dis, mesh, "dp", pad_multiple=8)
    src = np.asarray(inputs.dec_src)
    dst = np.asarray(inputs.dec_dst)
    lay1 = psd.build_scale_decoder_layout(src, dst, dataset.n_drug,
                                          dataset.n_dis)
    slay = build_scale_decoder_layout_sharded(
        src, dst, dataset.n_drug, dataset.n_dis, 4, mesh=mesh,
        axis="dp")
    sl1, sw1 = lay1.slot_labels(labels)
    sl2, sw2 = slay.slot_labels(labels)

    def loss_single(p):
        pred, *_ = forward(
            p, dc.replace(inputs, enc_graph=coo, dec_layout=lay1),
            model_cfg, train=True, key=jax.random.key(3))
        return jnp.sum(sw1 * (pred - sl1) ** 2)

    def loss_sharded(p):
        pred, *_ = forward(
            p, dc.replace(inputs, enc_graph=sharded, dec_layout=slay),
            model_cfg, train=True, key=jax.random.key(3))
        return jnp.sum(sw2 * (pred - sl2) ** 2)

    l1, g1 = jax.value_and_grad(loss_single)(params)
    l2, g2 = jax.jit(jax.value_and_grad(loss_sharded))(params)
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-4)
    flat1, tree1 = jax.tree.flatten(g1)
    flat2, tree2 = jax.tree.flatten(g2)
    assert tree1 == tree2
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-5)

"""Ring halo exchange COMPOSED with mp-sharded grid decoding
(VERDICT r3 #7): a >=2-layer model whose encoder runs the
edge-partitioned ring (``BipartiteShardedGrouped(ring=True)``, dp
axis) and whose decoder scores the full grid 2D-model-parallel
(drug rows -> dp, disease rows -> mp) in ONE jitted step on a dp x mp
mesh — loss and parameter gradients pinned against the single-device
dense path.  Round 3 only ever exercised the ring at layers=1 on a
flat dp mesh with no decoder sharding.
"""

import dataclasses

import jax

# ~4.5 min of interpret-mode ring sub-block kernels on the virtual
# mesh — slow tier (scripts/run_all_tests.sh), like the multihost ring.
pytestmark = __import__("pytest").mark.slow
import jax.numpy as jnp
import numpy as np
import pytest

import dream_gnn_tpu.kernels.pallas_decoder as pdk
import dream_gnn_tpu.kernels.pallas_spmm_gather as psg
from dream_gnn_tpu.config import ModelConfig, TrainConfig
from dream_gnn_tpu.data.loader import DreamDataset
from dream_gnn_tpu.data.synthetic import synthetic_raw_data
from dream_gnn_tpu.kernels.pallas_grid_decoder import (
    fused_grid_decoder_spmd2d)
from dream_gnn_tpu.model.dream_gnn import _encode, init_params
from dream_gnn_tpu.sharding.mesh import make_mesh
from dream_gnn_tpu.sharding.scale_graph import \
    build_enc_graph_sharded_grouped
from dream_gnn_tpu.train.loop import derive_model_cfg, fold_inputs
from dream_gnn_tpu.train.losses import bce_with_logits


@pytest.fixture(autouse=True)
def _interpret():
    old_g, old_d = psg.INTERPRET, pdk.INTERPRET
    psg.INTERPRET = pdk.INTERPRET = True
    yield
    psg.INTERPRET, pdk.INTERPRET = old_g, old_d


@pytest.fixture(scope="module")
def setup():
    raw = synthetic_raw_data(n_drug=24, n_dis=16, n_pos=48, seed=1)
    dataset = DreamDataset(raw, k=3)
    cfg = TrainConfig(model=ModelConfig(
        layers=2, gcn_agg_units=24, gcn_out_units=8, nhid1=16, nhid2=8,
        dropout=0.0, decode_mode="grid"))
    model_cfg = derive_model_cfg(cfg, dataset)
    params = init_params(jax.random.key(0), model_cfg)
    inputs, _, _, _ = fold_inputs(dataset, 0)
    return dataset, cfg, model_cfg, params, inputs


def _grid_loss(pred, enc):
    return bce_with_logits(pred.reshape(-1), enc.a1.reshape(-1),
                           weight=enc.mask.reshape(-1))


@pytest.mark.parametrize("dp,mp", [(2, 2), (4, 2)])
def test_ring_encoder_with_mp_grid_decoder(setup, dp, mp):
    dataset, cfg, model_cfg, params, inputs = setup
    if dp * mp > len(jax.devices()):
        pytest.skip("needs more virtual devices")
    mesh = make_mesh(dp=dp, mp=mp, devices=jax.devices()[: dp * mp])

    split = dataset.splits[0]
    ring_graph = build_enc_graph_sharded_grouped(
        split.train_pairs, split.train_values, dataset.n_drug,
        dataset.n_dis, mesh, "dp", ring=True)
    ring_inputs = dataclasses.replace(inputs, enc_graph=ring_graph)
    dense_enc = inputs.enc_graph
    key = jax.random.key(7)

    def composed_loss(params):
        drug_f, dis_f, *_ = _encode(
            params, ring_inputs, model_cfg, train=True,
            keys=jax.random.split(key, model_cfg.layers + 4),
            edge_masks=None)
        dec = params["decoder"]
        d = drug_f.shape[1]
        pd_ = jnp.dot(drug_f, dec["w1"][:d])
        pv_ = jnp.dot(dis_f, dec["w1"][d:])
        pred = fused_grid_decoder_spmd2d(
            mesh, "dp", "mp", pd_, pv_, dec["b1"], dec["w2"],
            dec["b2"], dec["w3"][:, 0], jnp.zeros((1,), jnp.int32),
            0.0, False, jnp.float32) + dec["b3"][0]
        return _grid_loss(pred, dense_enc)

    def reference_loss(params):
        from dream_gnn_tpu.nn.decoder import decoder_apply_grid

        drug_f, dis_f, *_ = _encode(
            params, inputs, model_cfg, train=True,
            keys=jax.random.split(key, model_cfg.layers + 4),
            edge_masks=None)
        pred = decoder_apply_grid(params["decoder"], drug_f, dis_f,
                                  dropout_rate=0.0, train=False,
                                  dtype=jnp.float32)
        return _grid_loss(pred, dense_enc)

    lc, gc = jax.value_and_grad(jax.jit(composed_loss))(params)
    lr, gr = jax.value_and_grad(jax.jit(reference_loss))(params)
    np.testing.assert_allclose(float(lc), float(lr), rtol=1e-5)
    flat_c, _ = jax.tree_util.tree_flatten_with_path(gc)
    flat_r, _ = jax.tree_util.tree_flatten_with_path(gr)
    for (pc, c), (pr, r) in zip(flat_c, flat_r):
        assert pc == pr
        np.testing.assert_allclose(np.asarray(c), np.asarray(r),
                                   rtol=2e-4, atol=1e-6,
                                   err_msg=str(pc))

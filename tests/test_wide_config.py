"""BASELINE config 4: wide model, fold-parallel over the mesh."""

import dataclasses

import jax
import numpy as np

from dream_gnn_tpu.config import TrainConfig, wide_model_config
from dream_gnn_tpu.data.loader import DreamDataset
from dream_gnn_tpu.data.synthetic import synthetic_raw_data
from dream_gnn_tpu.sharding.foldstack import stack_folds
from dream_gnn_tpu.sharding.mesh import make_mesh
from dream_gnn_tpu.sharding.partition import (make_multichip_train_step,
                                              shard_stacked)
from dream_gnn_tpu.train.loop import derive_model_cfg


def test_wide_config_dims():
    cfg = wide_model_config()
    assert cfg.layers == 5
    assert cfg.gcn_out_units == 512
    assert cfg.effective_msg_units(0) == 1536 // 3
    assert cfg.effective_msg_units(1) == 512


def test_wide_config_multichip_fold_parallel():
    """One training step of the wide config, 4 folds data-parallel on
    the virtual mesh (scaled-down dims, same structure)."""
    raw = synthetic_raw_data(n_drug=30, n_dis=24, n_pos=60, seed=13)
    dataset = DreamDataset(raw, k=3)
    model = wide_model_config(gcn_agg_units=96, gcn_out_units=32,
                              nhid1=48, nhid2=32,
                              compute_dtype="float32")
    cfg = TrainConfig(model=model)
    model_cfg = dataclasses.replace(
        derive_model_cfg(cfg, dataset), layers=5,
        gcn_agg_units=96, gcn_out_units=32, nhid1=48, nhid2=32)

    mesh = make_mesh(dp=4, mp=2)
    stacked = shard_stacked(mesh, stack_folds(dataset, [0, 1, 2, 3],
                                              pad_multiple=64))
    init_state, step = make_multichip_train_step(mesh, model_cfg, cfg)
    state = init_state(jax.random.key(0), 4)
    state, losses = step(state, stacked)
    assert np.isfinite(np.asarray(losses)).all()
    assert losses.shape == (4,)

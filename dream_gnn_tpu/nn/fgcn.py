"""FGCN: the feature (similarity-graph) route.

Re-design of reference ``FGCN``/``GCN``/``GraphConvolution``
(layers.py:238-321).  Two 2-layer GCNs — drug and disease — each run on
the kNN *similarity* graph and (when given) the kNN *feature* graph
with the same input (the raw similarity-matrix rows, so the input dim
is the node count, train.py:174-175), fused per node by
``relu(Linear(2*nhid2 -> nhid2))`` + dropout (layers.py:268-278).

The per-layer op ``spmm(adj, x @ W) + b`` (layers.py:306-316, torch
cuSPARSE) becomes ``kernels.spmm`` — a dense MXU matmul for these tiny
fixed graphs, segment-sum/Pallas for the sparse path.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from dream_gnn_tpu.kernels.spmm import spmm
from dream_gnn_tpu.nn import init as init_lib
from dream_gnn_tpu.nn.dropout import dropout


def _gcn_init(key, fdim, nhid1, nhid2):
    k1, k2 = jax.random.split(key)
    w1, b1 = init_lib.gcn_linear(k1, fdim, nhid1)
    w2, b2 = init_lib.gcn_linear(k2, nhid1, nhid2)
    return {"w1": w1, "b1": b1, "w2": w2, "b2": b2}


def _gcn_apply(p, x, adj, *, dropout_rate, train, key):
    """relu(gc1) -> dropout -> gc2 (layers.py:245-249)."""
    h = spmm(adj, jnp.dot(x, p["w1"], preferred_element_type=jnp.float32))
    h = jax.nn.relu(h + p["b1"])
    if train:
        h = dropout(key, h, dropout_rate, train)
    h = spmm(adj, jnp.dot(h, p["w2"], preferred_element_type=jnp.float32))
    return h + p["b2"]


def fgcn_init(key, *, fdim_drug: int, fdim_disease: int,
              nhid1: int, nhid2: int):
    kd, kv, kfd, kfv = jax.random.split(key, 4)
    wfd, bfd = init_lib.torch_linear(kfd, nhid2 * 2, nhid2)
    wfv, bfv = init_lib.torch_linear(kfv, nhid2 * 2, nhid2)
    return {
        "drug_gcn": _gcn_init(kd, fdim_drug, nhid1, nhid2),
        "dis_gcn": _gcn_init(kv, fdim_disease, nhid1, nhid2),
        "drug_fusion_w": wfd, "drug_fusion_b": bfd,
        "dis_fusion_w": wfv, "dis_fusion_b": bfv,
    }


def fgcn_apply(params, drug_graph, drug_sim_feat, dis_graph, dis_sim_feat,
               drug_feature_graph=None, dis_feature_graph=None, *,
               dropout_rate: float, train: bool = False,
               key: Optional[jax.Array] = None):
    """Returns (emb1, emb2, emb1_sim, emb1_feat, emb2_sim, emb2_feat)
    exactly like reference FGCN.forward (layers.py:260-285)."""
    if train:
        assert key is not None
        keys = jax.random.split(key, 6)
    else:
        keys = [None] * 6

    emb1_sim = _gcn_apply(params["drug_gcn"], drug_sim_feat, drug_graph,
                          dropout_rate=dropout_rate, train=train, key=keys[0])
    emb2_sim = _gcn_apply(params["dis_gcn"], dis_sim_feat, dis_graph,
                          dropout_rate=dropout_rate, train=train, key=keys[1])

    if drug_feature_graph is None or dis_feature_graph is None:
        return emb1_sim, emb2_sim, emb1_sim, None, emb2_sim, None

    emb1_feat = _gcn_apply(params["drug_gcn"], drug_sim_feat,
                           drug_feature_graph, dropout_rate=dropout_rate,
                           train=train, key=keys[2])
    emb2_feat = _gcn_apply(params["dis_gcn"], dis_sim_feat,
                           dis_feature_graph, dropout_rate=dropout_rate,
                           train=train, key=keys[3])

    fused_drug = jax.nn.relu(
        jnp.concatenate([emb1_sim, emb1_feat], axis=1) @ params["drug_fusion_w"]
        + params["drug_fusion_b"])
    fused_dis = jax.nn.relu(
        jnp.concatenate([emb2_sim, emb2_feat], axis=1) @ params["dis_fusion_w"]
        + params["dis_fusion_b"])
    if train:
        fused_drug = dropout(keys[4], fused_drug, dropout_rate, train)
        fused_dis = dropout(keys[5], fused_dis, dropout_rate, train)
    return fused_drug, fused_dis, emb1_sim, emb1_feat, emb2_sim, emb2_feat

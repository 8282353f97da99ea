"""GCMC layer: relation-typed bipartite graph convolution.

TPU-native re-design of the reference's ``GCMCLayer`` +
``GCMCGraphConv`` + ``dglnn.HeteroGraphConv`` stack (layers.py:18-236).
Per rating r and direction, the reference runs: ``feat @ W_r``,
multiply by a *node-dropped* source norm ``dropout(cj)``
(layers.py:224-225 — a node dropout on messages, not an edge dropout),
``update_all(copy_u, sum)`` (SpMM), then scale by the dst norm ``ci``.
Outputs are summed over relations ('sum' accumulation), activated,
dropped out, and projected by a shared Linear (layers.py:133-141).

Here each (rating, direction) aggregation is one dense MXU matmul over
the adjacency mask (see graph/bipartite.py for why dense wins), with
optional per-etype edge-dropout masks multiplied in-graph — the
augmentation never rebuilds anything.

Weight parity notes:
- basis decomposition ``W = att @ basis`` ties the relations' weights
  (layers.py:70-71,120-121); the reverse direction reuses the forward
  ``W[r]`` (layers.py:126-127);
- under ``share_param`` the drug/disease output projections are one
  module (``ufc is ifc``, layers.py:61-64);
- 'stack' accumulation is not implemented: in the reference its output
  shape (N, R, eff) cannot feed ``Linear(eff, out)`` coherently and the
  default is 'sum' (train.py:411).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from dream_gnn_tpu.graph.bipartite import BipartiteGraph
from dream_gnn_tpu.graph.coo import CooGraph
from dream_gnn_tpu.kernels.spmm import spmm_coo
from dream_gnn_tpu.nn import init as init_lib
from dream_gnn_tpu.nn.dropout import dropout
from dream_gnn_tpu.utils.activations import get_activation


def gcmc_layer_init(key, *, in_units: int, msg_units: int, out_units: int,
                    num_ratings: int = 2, basis_units: int = 2,
                    share_param: bool = True):
    """Init one GCMC layer's params.

    Everything with >1 dim is xavier_uniform (reference
    ``reset_parameters``, layers.py:112-115); Linear biases keep the
    torch default U(+-1/sqrt(fan_in)).
    """
    k_att, k_basis, k_fc, k_ifc, k_conv = jax.random.split(key, 5)
    params = {
        "att": init_lib.xavier_uniform(k_att, (num_ratings, basis_units)),
        "basis": init_lib.xavier_uniform(k_basis, (basis_units, in_units, msg_units)),
        "fc_w": init_lib.xavier_linear(k_fc, msg_units, out_units),
        "fc_b": init_lib.torch_linear(k_fc, msg_units, out_units)[1],
    }
    if not share_param:
        params["ifc_w"] = init_lib.xavier_linear(k_ifc, msg_units, out_units)
        params["ifc_b"] = init_lib.torch_linear(k_ifc, msg_units, out_units)[1]
        # Non-shared convs own per-(rating, direction) weights
        # (layers.py:86-97) instead of the basis decomposition.
        params["conv_w"] = init_lib.xavier_uniform(
            k_conv, (num_ratings, 2, in_units, msg_units))
    return params


def _relation_weights(params, num_ratings: int, share_param: bool):
    if share_param:
        basis = params["basis"]
        b, in_units, msg_units = basis.shape
        w = jnp.dot(params["att"], basis.reshape(b, -1),
                    preferred_element_type=jnp.float32)
        w = w.reshape(num_ratings, in_units, msg_units)
        return w, w  # same W for forward and reverse etypes
    return params["conv_w"][:, 0], params["conv_w"][:, 1]


def gcmc_layer_apply(params, graph: BipartiteGraph,
                     drug_feat: jnp.ndarray, dis_feat: jnp.ndarray, *,
                     dropout_rate: float, agg_act: str = "leaky",
                     share_param: bool = True, train: bool = False,
                     key: Optional[jax.Array] = None,
                     edge_masks=None):
    """One GCMC layer forward.

    Args:
      edge_masks: optional dict with 'fwd'/'rev' arrays of shape
        (R, n_drug, n_dis) — per-etype edge keep-masks from in-graph
        augmentation.  The graph's ci/cj stay *stale* by construction
        (parity trap, SURVEY.md §7.3.3).
    Returns (drug_out, dis_out), each (N, out_units).
    """
    num_ratings = params["att"].shape[0]
    act = get_activation(agg_act)
    if train:
        assert key is not None
        keys = jax.random.split(key, 2 * num_ratings + 2)

    w_fwd, w_rev = _relation_weights(params, num_ratings, share_param)

    dense = isinstance(graph, BipartiteGraph)
    if dense:
        adjs = [graph.a0(), graph.a1]  # rating order = rating_vals [0, 1]
    msg_dis = 0.0
    msg_drug = 0.0
    for r in range(num_ratings):
        # drug -> disease (etype str(r)): node-dropout on the src norm cj
        # (layers.py:224-225), fresh mask per (rating, direction).
        cj_d = graph.cj_drug
        cj_v = graph.cj_dis
        if train:
            cj_d = dropout(keys[2 * r], cj_d, dropout_rate, train)
            cj_v = dropout(keys[2 * r + 1], cj_v, dropout_rate, train)
        hd = jnp.dot(drug_feat, w_fwd[r], preferred_element_type=jnp.float32)
        hv = jnp.dot(dis_feat, w_rev[r], preferred_element_type=jnp.float32)
        if dense:
            a_f = adjs[r] if edge_masks is None \
                else adjs[r] * edge_masks["fwd"][r]
            a_r = adjs[r] if edge_masks is None \
                else adjs[r] * edge_masks["rev"][r]
            if edge_masks is not None and "fwd_add" in edge_masks:
                # add_random_edges: union with the sampled add mask —
                # hits on existing edges are no-ops (duplicate check).
                a_f = jnp.maximum(a_f, edge_masks["fwd_add"][r])
                a_r = jnp.maximum(a_r, edge_masks["rev_add"][r])
            msg_dis = msg_dis + jnp.dot(a_f.T, hd * cj_d,
                                        preferred_element_type=jnp.float32)
            # disease -> drug (etype rev-r) reuses W[r] (layers.py:126-127)
            msg_drug = msg_drug + jnp.dot(a_r, hv * cj_v,
                                          preferred_element_type=jnp.float32)
        else:
            from dream_gnn_tpu.graph.grouped import BipartiteGrouped
            from dream_gnn_tpu.graph.slabbed import BipartiteSlabbed
            from dream_gnn_tpu.sharding.scale_graph import (
                BipartiteSharded, BipartiteShardedGrouped,
                spmm_gather_sharded, spmm_gather_sharded_ring)

            if isinstance(graph, BipartiteShardedGrouped):
                # Production multi-chip scale path: per-shard Pallas
                # gather-kernel aggregation + all_gather halo exchange.
                g_f, g_r = graph.fwd[r], graph.rev[r]
                if edge_masks is not None:
                    assert edge_masks.get("kind") == "grouped_prf", \
                        "sharded-grouped layout needs PRF edge masks"
                    from dream_gnn_tpu.augment.masks import prf_mask_pair
                    rate = edge_masks["rate"]
                    g_f = prf_mask_pair(g_f, edge_masks["fwd_salts"][r],
                                        rate)
                    g_r = prf_mask_pair(g_r, edge_masks["rev_salts"][r],
                                        rate)
                n_shards = graph.mesh.shape[graph.axis]
                # ring=True: double-buffered ppermute halo exchange
                # overlapped with the per-block local aggregation.
                spmm_sh = (spmm_gather_sharded_ring if graph.ring
                           else spmm_gather_sharded)
                msg_dis = msg_dis + spmm_sh(
                    graph.mesh, graph.axis, g_f, hd * cj_d,
                    graph.n_dis, -(-graph.n_dis // n_shards))
                msg_drug = msg_drug + spmm_sh(
                    graph.mesh, graph.axis, g_r, hv * cj_v,
                    graph.n_drug, -(-graph.n_drug // n_shards))
            elif isinstance(graph, BipartiteSharded):
                # Multi-chip scale path: dst-partitioned relations, halo
                # exchange (all_gather over ICI) inside shard_map; the
                # backward pass transposes it to a reduce_scatter.
                import dataclasses as _dc

                from dream_gnn_tpu.sharding.edge_partition import \
                    spmm_sharded

                g_f, g_r = graph.fwd[r], graph.rev[r]
                if edge_masks is not None:
                    g_f = _dc.replace(g_f,
                                      val=g_f.val * edge_masks["fwd"][r])
                    g_r = _dc.replace(g_r,
                                      val=g_r.val * edge_masks["rev"][r])
                msg_dis = msg_dis + spmm_sharded(
                    graph.mesh, graph.axis, g_f,
                    hd * cj_d)[: graph.n_dis]
                msg_drug = msg_drug + spmm_sharded(
                    graph.mesh, graph.axis, g_r,
                    hv * cj_v)[: graph.n_drug]
            elif isinstance(graph, BipartiteSlabbed):
                # v3 single-device scale path: slab-streamed Pallas
                # SpMM (kernels/pallas_spmm_slab).  Same PRF edge-mask
                # contract as the grouped path: masks key on physical
                # edge ids shared by the fwd/transposed layouts, so
                # the custom VJP stays exact under edge dropout.
                from dream_gnn_tpu.kernels.pallas_spmm_slab import \
                    spmm_slab

                g_f, g_r = graph.fwd[r], graph.rev[r]
                if edge_masks is not None:
                    assert edge_masks.get("kind") == "grouped_prf", \
                        "slabbed layout needs PRF edge masks"
                    from dream_gnn_tpu.augment.masks import prf_mask_pair
                    rate = edge_masks["rate"]
                    g_f = prf_mask_pair(g_f, edge_masks["fwd_salts"][r],
                                        rate)
                    g_r = prf_mask_pair(g_r, edge_masks["rev_salts"][r],
                                        rate)
                msg_dis = msg_dis + spmm_slab(g_f, hd * cj_d)
                msg_drug = msg_drug + spmm_slab(g_r, hv * cj_v)
            elif isinstance(graph, BipartiteGrouped):
                # Scale path: grouped-gather Pallas SpMM.  Edge-dropout
                # masks are a PRF of the physical edge id, so the fwd
                # and transposed layouts of each relation see the SAME
                # drops and the custom VJP stays exact.
                from dream_gnn_tpu.kernels.pallas_spmm_gather import \
                    spmm_gather

                g_f, g_r = graph.fwd[r], graph.rev[r]
                if edge_masks is not None:
                    assert edge_masks.get("kind") == "grouped_prf", \
                        "grouped layout needs PRF edge masks"
                    from dream_gnn_tpu.augment.masks import prf_mask_pair
                    rate = edge_masks["rate"]
                    g_f = prf_mask_pair(g_f, edge_masks["fwd_salts"][r],
                                        rate)
                    g_r = prf_mask_pair(g_r, edge_masks["rev_salts"][r],
                                        rate)
                msg_dis = msg_dis + spmm_gather(g_f, hd * cj_d)
                msg_drug = msg_drug + spmm_gather(g_r, hv * cj_v)
            else:
                # Sparse COO layout: edge dropout masks are per edge.
                g_f: CooGraph = graph.fwd[r]
                g_r: CooGraph = graph.rev[r]
                if edge_masks is not None:
                    import dataclasses as _dc
                    g_f = _dc.replace(g_f,
                                      val=g_f.val * edge_masks["fwd"][r])
                    g_r = _dc.replace(g_r,
                                      val=g_r.val * edge_masks["rev"][r])
                msg_dis = msg_dis + spmm_coo(g_f, hd * cj_d)
                msg_drug = msg_drug + spmm_coo(g_r, hv * cj_v)

    drug_h = act(msg_drug * graph.ci_drug)
    dis_h = act(msg_dis * graph.ci_dis)
    if train:
        drug_h = dropout(keys[-2], drug_h, dropout_rate, train)
        dis_h = dropout(keys[-1], dis_h, dropout_rate, train)

    # Output projections: drug through ifc, disease through ufc; one
    # shared module under share_param (layers.py:61-64,140-141).
    if share_param:
        drug_out = drug_h @ params["fc_w"] + params["fc_b"]
        dis_out = dis_h @ params["fc_w"] + params["fc_b"]
    else:
        drug_out = drug_h @ params["ifc_w"] + params["ifc_b"]
        dis_out = dis_h @ params["fc_w"] + params["fc_b"]
    return drug_out, dis_out

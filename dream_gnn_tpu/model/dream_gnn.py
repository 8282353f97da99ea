"""DREAM-GNN dual-route model composition.

Re-design of reference ``Net`` (model.py:4-103):

- **GCMC route**: L stacked relation-typed bipartite conv layers with
  decayed residual accumulation ``out = h1 + h2/2 + h3/3``
  (model.py:67-76) while features chain layer-to-layer;
- **FGCN route**: two 2-layer GCNs per entity over the kNN similarity
  and feature-kNN graphs (model.py:79-83);
- one **shared** Attention instance fuses the two routes for drugs and
  diseases alike (model.py:55,93-97 — parity trap §7.3.7);
- the MLP decoder scores candidate edges (model.py:100).

Everything is a pure function of (params, inputs, key) and jit/vmaps
over folds; ``train`` is a static trace-time flag.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from dream_gnn_tpu.config import ModelConfig
from dream_gnn_tpu.graph.bipartite import BipartiteGraph
from dream_gnn_tpu.nn.attention import attention_apply, attention_init
from dream_gnn_tpu.nn.decoder import (decoder_apply, decoder_apply_grid,
                                      decoder_init)
from dream_gnn_tpu.nn.fgcn import fgcn_apply, fgcn_init
from dream_gnn_tpu.nn.gcmc import gcmc_layer_apply, gcmc_layer_init

# Measurement-only (see the dispatch site below); default off.
_BARRIER_SCALE_DECODER = False


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ModelInputs:
    """One forward pass's graph+feature inputs (mirrors Net.forward's
    argument list, model.py:60-64)."""

    enc_graph: BipartiteGraph
    dec_src: jnp.ndarray               # (E,) drug ids, candidate-pair order
    dec_dst: jnp.ndarray               # (E,) disease ids
    drug_graph: Any                    # NormAdj | CooGraph | dense array
    drug_sim_feat: jnp.ndarray         # (n_drug, fdim_drug) similarity rows
    drug_feat: jnp.ndarray             # (n_drug, src_in_units) embeddings
    dis_graph: Any
    dis_sim_feat: jnp.ndarray
    dis_feat: jnp.ndarray
    drug_feature_graph: Any = None
    dis_feature_graph: Any = None
    # Prebuilt ScaleDecoderLayout (kernels/pallas_scale_decoder.py) for
    # candidate sets over node counts beyond the VMEM fused decoder's
    # MAX_ONEHOT_NODES; like the reference's dec graph it is static per
    # fold (data_loader.py:492-509).
    dec_layout: Any = None


def init_params(key, cfg: ModelConfig):
    if cfg.gcn_agg_accum != "sum":
        # 'stack' is incoherent in the reference itself (its (N, R, eff)
        # stack cannot feed Linear(eff, out); see nn/gcmc.py docstring)
        # and the default is 'sum' — reject loudly instead of silently
        # summing.
        raise NotImplementedError(
            f"gcn_agg_accum={cfg.gcn_agg_accum!r}: only 'sum' is supported")
    n_layers = cfg.layers
    keys = jax.random.split(key, n_layers + 3)
    tgcn = []
    for i in range(n_layers):
        tgcn.append(gcmc_layer_init(
            keys[i],
            in_units=cfg.layer_in_units(i),
            msg_units=cfg.effective_msg_units(i),
            out_units=cfg.gcn_out_units,
            num_ratings=cfg.num_ratings,
            basis_units=cfg.basis_units,
            share_param=cfg.share_param))
    return {
        "tgcn": tgcn,
        "fgcn": fgcn_init(keys[-3], fdim_drug=cfg.fdim_drug,
                          fdim_disease=cfg.fdim_disease,
                          nhid1=cfg.nhid1, nhid2=cfg.nhid2),
        "attention": attention_init(keys[-2], in_size=cfg.gcn_out_units,
                                    hidden_size=cfg.attention_hidden),
        "decoder": decoder_init(keys[-1], in_units=cfg.gcn_out_units,
                                hidden1=cfg.decoder_hidden1,
                                hidden2=cfg.decoder_hidden2),
    }


def _encode(params, inputs: ModelInputs, cfg: ModelConfig, *,
            train: bool, keys, edge_masks):
    """Everything up to the decoder: GCMC route, FGCN route, attention
    fusion.  ``keys`` is the (layers+4,) split of the forward key when
    training (index layers+3 is reserved for the decoder), else None.

    Returns (drug_feats, dis_feats, drug_out, drug_sim_out, dis_out,
    dis_sim_out).
    """
    if keys is None:
        keys = [None] * (cfg.layers + 4)

    drug_feat, dis_feat = inputs.drug_feat, inputs.dis_feat
    drug_out = dis_out = 0.0
    for i in range(cfg.layers):
        drug_o, dis_o = gcmc_layer_apply(
            params["tgcn"][i], inputs.enc_graph, drug_feat, dis_feat,
            dropout_rate=cfg.dropout, agg_act=cfg.model_activation,
            share_param=cfg.share_param, train=train, key=keys[i],
            edge_masks=edge_masks)
        # Decayed residual accumulation (model.py:67-76).
        drug_out = drug_o if i == 0 else drug_out + drug_o / float(i + 1)
        dis_out = dis_o if i == 0 else dis_out + dis_o / float(i + 1)
        drug_feat, dis_feat = drug_o, dis_o

    drug_sim_out, dis_sim_out, *_ = fgcn_apply(
        params["fgcn"], inputs.drug_graph, inputs.drug_sim_feat,
        inputs.dis_graph, inputs.dis_sim_feat,
        inputs.drug_feature_graph, inputs.dis_feature_graph,
        dropout_rate=cfg.dropout, train=train, key=keys[cfg.layers])

    drug_feats, _ = attention_apply(
        params["attention"], jnp.stack([drug_out, drug_sim_out], axis=1),
        dropout_rate=cfg.attention_dropout, train=train,
        key=keys[cfg.layers + 1])
    dis_feats, _ = attention_apply(
        params["attention"], jnp.stack([dis_out, dis_sim_out], axis=1),
        dropout_rate=cfg.attention_dropout, train=train,
        key=keys[cfg.layers + 2])
    return drug_feats, dis_feats, drug_out, drug_sim_out, dis_out, dis_sim_out


def forward(params, inputs: ModelInputs, cfg: ModelConfig, *,
            train: bool = False, key: Optional[jax.Array] = None,
            edge_masks=None):
    """Full dual-route forward.

    Returns (pred_logits, drug_out, drug_sim_out, dis_out, dis_sim_out)
    — the intermediates feed the covariance common loss (train.py:289).
    """
    if train:
        assert key is not None
        keys = jax.random.split(key, cfg.layers + 4)
    else:
        keys = None

    (drug_feats, dis_feats, drug_out, drug_sim_out, dis_out,
     dis_sim_out) = _encode(params, inputs, cfg, train=train, keys=keys,
                            edge_masks=edge_masks)
    dec_key = keys[cfg.layers + 3] if train else None

    if cfg.decode_mode == "grid":
        # pred is the (n_drug, n_dis) logit grid; the loss/metrics mask
        # out-of-fold cells with enc_graph.mask (labels = enc_graph.a1).
        if cfg.decoder_backend == "pallas":
            from dream_gnn_tpu.kernels.pallas_grid_decoder import (
                decoder_apply_grid_fused)
            pred = decoder_apply_grid_fused(
                params["decoder"], drug_feats, dis_feats,
                dropout_rate=cfg.dropout, train=train, key=dec_key,
                dtype=jnp.dtype(cfg.compute_dtype))
        else:
            pred = decoder_apply_grid(
                params["decoder"], drug_feats, dis_feats,
                dropout_rate=cfg.dropout, train=train, key=dec_key,
                dtype=jnp.dtype(cfg.compute_dtype))
        return pred, drug_out, drug_sim_out, dis_out, dis_sim_out

    if cfg.decoder_backend == "pallas" and inputs.dec_layout is not None:
        if _BARRIER_SCALE_DECODER:
            # MEASUREMENT-ONLY knob (scripts/probe_step_context.py):
            # fence the encoder outputs so XLA cannot fuse/reschedule
            # encoder work into the decoder phase — probes whether the
            # ~13 ms "step context" (docs §4) is a pessimizing
            # cross-phase schedule.
            drug_feats, dis_feats = jax.lax.optimization_barrier(
                (drug_feats, dis_feats))
        from dream_gnn_tpu.sharding.scale_decoder_spmd import (
            ShardedScaleDecoderLayout, decoder_apply_scale_spmd)
        if isinstance(inputs.dec_layout, ShardedScaleDecoderLayout):
            # Candidate-sharded SPMD pipeline (mesh/axis captured at
            # layout build); pred is (S, n_pos) slot-order, sharded
            # over the layout's axis.
            if inputs.dec_layout.mesh is None or inputs.dec_layout.axis is None:
                raise ValueError(
                    "ShardedScaleDecoderLayout routed through the model "
                    "needs mesh+axis captured at build time — pass "
                    "mesh=/axis= to build_scale_decoder_layout_sharded "
                    "(a mesh-less layout only works with the explicit "
                    "decoder_apply_scale_spmd(..., mesh, axis) call)")
            pred = decoder_apply_scale_spmd(
                params["decoder"], inputs.dec_layout, drug_feats,
                dis_feats, inputs.dec_layout.mesh,
                inputs.dec_layout.axis, dropout_rate=cfg.dropout,
                train=train, key=dec_key,
                dtype=jnp.dtype(cfg.compute_dtype))
            return pred, drug_out, drug_sim_out, dis_out, dis_sim_out
        from dream_gnn_tpu.kernels.pallas_scale_decoder import (
            decoder_apply_scale)
        pred = decoder_apply_scale(
            params["decoder"], inputs.dec_layout, drug_feats, dis_feats,
            dropout_rate=cfg.dropout, train=train, key=dec_key,
            dtype=jnp.dtype(cfg.compute_dtype))
    elif cfg.decoder_backend == "pallas":
        from dream_gnn_tpu.kernels.pallas_decoder import decoder_apply_fused
        pred = decoder_apply_fused(
            params["decoder"], inputs.dec_src, inputs.dec_dst,
            drug_feats, dis_feats, dropout_rate=cfg.dropout,
            train=train, key=dec_key,
            dtype=jnp.dtype(cfg.compute_dtype))
    else:
        pred = decoder_apply(params["decoder"], inputs.dec_src,
                             inputs.dec_dst, drug_feats, dis_feats,
                             dropout_rate=cfg.dropout, train=train,
                             key=dec_key,
                             dtype=jnp.dtype(cfg.compute_dtype))
    return pred, drug_out, drug_sim_out, dis_out, dis_sim_out


def forward_stacked(params, inputs: ModelInputs, cfg: ModelConfig, *,
                    train: bool = False, key: Optional[jax.Array] = None,
                    edge_masks=None, mesh=None):
    """Fold-batched forward: every array (params leaves, input leaves,
    ``key``, ``edge_masks`` leaves) carries a leading fold axis F.

    The encoder runs under ``jax.vmap`` (batched MXU matmuls); the
    per-edge decoder — which a vmapped pallas_call cannot express —
    dispatches to the fold-batched fused kernel when the backend is
    'pallas', else to the vmapped XLA decoder.  PRNG key threading per
    fold is identical to ``forward`` (same split sizes and indices).

    ``mesh``: the dp x mp device mesh of the multi-chip path — the
    fused Pallas decoders then run under their shard_map partitioning
    rules (fold axis -> dp, edge/disease dim -> mp; see
    kernels/pallas_decoder_batched.py:fused_decoder_batched_spmd) while
    the encoder is GSPMD-partitioned by XLA as usual.

    Returns (pred (F, E), drug_out, drug_sim_out, dis_out, dis_sim_out)
    with leading fold axes.
    """
    if train:
        assert key is not None
        keys = jax.vmap(lambda k: jax.random.split(k, cfg.layers + 4))(key)
        if edge_masks is None:
            enc = jax.vmap(lambda p, i, k: _encode(
                p, i, cfg, train=True, keys=k, edge_masks=None))(
                params, inputs, keys)
        else:
            enc = jax.vmap(lambda p, i, k, m: _encode(
                p, i, cfg, train=True, keys=k, edge_masks=m))(
                params, inputs, keys, edge_masks)
        dec_keys = keys[:, cfg.layers + 3]
    else:
        enc = jax.vmap(lambda p, i: _encode(
            p, i, cfg, train=False, keys=None, edge_masks=None))(
            params, inputs)
        dec_keys = None

    drug_feats, dis_feats, drug_out, drug_sim_out, dis_out, dis_sim_out = enc

    if cfg.decode_mode == "grid":
        if cfg.decoder_backend == "pallas":
            from dream_gnn_tpu.kernels.pallas_grid_decoder import (
                decoder_apply_grid_fused_batched)
            pred = decoder_apply_grid_fused_batched(
                params["decoder"], drug_feats, dis_feats,
                dropout_rate=cfg.dropout, train=train, key=dec_keys,
                dtype=jnp.dtype(cfg.compute_dtype), mesh=mesh)
        elif train:
            pred = jax.vmap(lambda p, df, vf, k: decoder_apply_grid(
                p, df, vf, dropout_rate=cfg.dropout, train=True, key=k,
                dtype=jnp.dtype(cfg.compute_dtype)))(
                params["decoder"], drug_feats, dis_feats, dec_keys)
        else:
            pred = jax.vmap(lambda p, df, vf: decoder_apply_grid(
                p, df, vf, dropout_rate=cfg.dropout, train=False,
                dtype=jnp.dtype(cfg.compute_dtype)))(
                params["decoder"], drug_feats, dis_feats)
        return pred, drug_out, drug_sim_out, dis_out, dis_sim_out

    from dream_gnn_tpu.kernels.pallas_decoder import MAX_ONEHOT_NODES
    use_pallas = (cfg.decoder_backend == "pallas"
                  and max(drug_feats.shape[1],
                          dis_feats.shape[1]) <= MAX_ONEHOT_NODES)
    if use_pallas:
        from dream_gnn_tpu.kernels.pallas_decoder_batched import (
            decoder_apply_fused_batched)
        pred = decoder_apply_fused_batched(
            params["decoder"], inputs.dec_src, inputs.dec_dst,
            drug_feats, dis_feats, dropout_rate=cfg.dropout, train=train,
            key=dec_keys, dtype=jnp.dtype(cfg.compute_dtype), mesh=mesh)
    elif train:
        pred = jax.vmap(lambda p, s, d, df, vf, k: decoder_apply(
            p, s, d, df, vf, dropout_rate=cfg.dropout, train=True,
            key=k, dtype=jnp.dtype(cfg.compute_dtype)))(
            params["decoder"], inputs.dec_src, inputs.dec_dst,
            drug_feats, dis_feats, dec_keys)
    else:
        pred = jax.vmap(lambda p, s, d, df, vf: decoder_apply(
            p, s, d, df, vf, dropout_rate=cfg.dropout, train=False,
            dtype=jnp.dtype(cfg.compute_dtype)))(
            params["decoder"], inputs.dec_src, inputs.dec_dst,
            drug_feats, dis_feats)
    return pred, drug_out, drug_sim_out, dis_out, dis_sim_out

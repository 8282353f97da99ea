"""Mesh partitioning of the fold-stacked training step.

Sharding layout (see sharding/mesh.py for the axes):

- every leaf's leading fold axis -> ``dp`` (independent folds train in
  parallel; the reference runs them sequentially, train.py:500);
- the disease-node dimension of the bipartite masks, disease-side node
  arrays, and the decoder edge dimension -> ``mp``.  Drug-side arrays
  stay replicated within a fold group; XLA inserts the all-gather /
  psum collectives for cross-shard contractions over ICI.

This is the GNN analogue of TP/SP: the node/edge dimension plays the
sequence role (SURVEY.md §5, long-context entry).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dream_gnn_tpu.config import ModelConfig, TrainConfig
from dream_gnn_tpu.graph.bipartite import BipartiteGraph
from dream_gnn_tpu.graph.knn import NormAdj
from dream_gnn_tpu.model.dream_gnn import ModelInputs, init_params
from dream_gnn_tpu.sharding.foldstack import StackedFolds
from dream_gnn_tpu.train.optim import make_optimizer
from dream_gnn_tpu.train.step import TrainState


def stacked_input_sharding(mesh: Mesh) -> ModelInputs:
    """NamedSharding pytree matching a fold-stacked ModelInputs."""
    def ns(*spec):
        return NamedSharding(mesh, P(*spec))

    drug_side = ns("dp", None, None)     # replicated inside a fold group
    dis_side = ns("dp", "mp", None)      # disease/node dim sharded
    enc = BipartiteGraph(
        a1=ns("dp", None, "mp"), mask=ns("dp", None, "mp"),
        ci_drug=drug_side, cj_drug=drug_side,
        ci_dis=dis_side, cj_dis=dis_side)
    return ModelInputs(
        enc_graph=enc,
        dec_src=ns("dp", "mp"), dec_dst=ns("dp", "mp"),
        drug_graph=NormAdj(a=drug_side),
        drug_sim_feat=drug_side, drug_feat=drug_side,
        dis_graph=NormAdj(a=dis_side),
        dis_sim_feat=dis_side, dis_feat=dis_side,
        drug_feature_graph=NormAdj(a=drug_side),
        dis_feature_graph=NormAdj(a=dis_side))


def shard_stacked(mesh: Mesh, stacked: StackedFolds) -> StackedFolds:
    """Commit the stacked fold arrays to their mesh shardings."""
    edges = NamedSharding(mesh, P("dp", "mp"))
    return StackedFolds(
        inputs=jax.device_put(stacked.inputs, stacked_input_sharding(mesh)),
        labels=jax.device_put(stacked.labels, edges),
        edge_weight=jax.device_put(stacked.edge_weight, edges))


def shard_state(mesh: Mesh, state: TrainState) -> TrainState:
    """Leading fold axis of every state leaf -> dp; rest replicated."""
    def _shard(leaf):
        spec = P(*(("dp",) + (None,) * (jnp.ndim(leaf) - 1)))
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree.map(_shard, state)


def make_multichip_train_step(mesh: Mesh, model_cfg: ModelConfig,
                              train_cfg: TrainConfig):
    """Returns (init_stacked_state, step).

    ``init_stacked_state(key, n_folds)`` builds per-fold params/opt
    state (folds are independent runs) sharded over the mesh;
    ``step(state, stacked)`` advances every fold by one iteration.

    Single-step convenience wrapper over the interval runner's
    fold-batched step (train/stacked.py): with
    ``decoder_backend='pallas'`` the fused decoders run under their
    shard_map SPMD rules on the mesh — nothing is silently downgraded
    to the XLA lowerings.  For whole eval intervals use
    ``make_multichip_train_fns`` (one dispatch per interval).
    """
    from dream_gnn_tpu.train.stacked import make_one_step_stacked

    tx = make_optimizer(train_cfg.train_grad_clip, train_cfg.weight_decay)
    one_step = make_one_step_stacked(model_cfg, train_cfg, tx, mesh=mesh)

    def init_stacked_state(key, n_folds: int) -> TrainState:
        p_keys, s_keys = jax.random.split(key)
        params = jax.vmap(lambda k: init_params(k, model_cfg))(
            jax.random.split(p_keys, n_folds))
        state = TrainState(
            params=params,
            opt_state=jax.vmap(tx.init)(params),
            key=jax.random.split(s_keys, n_folds),
            lr=jnp.full((n_folds,), train_cfg.train_lr, jnp.float32))
        return shard_state(mesh, state)

    @jax.jit
    def step(state: TrainState, stacked: StackedFolds):
        return one_step(state, stacked.inputs, stacked.labels,
                        stacked.edge_weight)

    return init_stacked_state, step


def make_multichip_train_fns(mesh: Mesh, model_cfg: ModelConfig,
                             train_cfg: TrainConfig):
    """Mesh-sharded fold-parallel protocol fns.

    The production interval runner (train/stacked.py: scanned
    fold-batched step + both evals in ONE dispatch) compiled over a
    dp x mp mesh: the fold axis shards over ``dp`` and the disease
    node/edge dimensions over ``mp`` (see stacked_input_sharding); XLA
    inserts the ICI collectives for cross-shard contractions.  With
    ``decoder_backend='pallas'`` the fused decoders run under their
    shard_map partitioning rules (fold -> dp, edge/disease dim -> mp;
    kernels/pallas_decoder_batched.py:fused_decoder_batched_spmd and
    kernels/pallas_grid_decoder.py:fused_grid_decoder_batched_spmd) —
    the measured single-chip decoder fusion win carries to the mesh.

    Returns ``(init_state, run_steps, run_interval)`` with the stacked
    signatures; ``init_state`` takes the per-fold key stack and returns
    a mesh-sharded TrainState.  Shard the data with
    ``shard_stacked(mesh, stacked)`` first.
    """
    from dream_gnn_tpu.train.stacked import make_stacked_train_fns

    init_state, run_steps, run_interval = make_stacked_train_fns(
        model_cfg, train_cfg, mesh=mesh)

    def init_sharded(fold_keys) -> TrainState:
        return shard_state(mesh, init_state(fold_keys))

    return init_sharded, run_steps, run_interval

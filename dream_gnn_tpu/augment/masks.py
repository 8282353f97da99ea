"""In-graph stochastic augmentation.

The reference rebuilds host-side DGL graphs / COO tensors every
training iteration (augmentation.py:13-124, called from train.py:267)
— a full CPU graph reconstruction inside the hot loop.  Here every
augmentation is a random *mask* drawn inside the jitted train step:
shapes stay static, nothing is rebuilt, and the whole step stays on
device.

Parity notes (SURVEY.md §7.3.2-3):
- augmentation runs unconditionally every iteration with default
  methods ('edge_dropout', 'feature_noise');
- edge dropout keeps the graph's original ci/cj norms (stale) and
  drops forward/reverse etype edge sets independently;
- the reference keeps exactly ``int(E*(1-p))`` edges via randperm; we
  use iid Bernoulli(1-p) per edge — same marginal rate, statistically
  equivalent for the edge counts involved (documented deviation);
- dropped sparse-graph edges keep their stale row-normalised values.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from dream_gnn_tpu.config import AugmentConfig
from dream_gnn_tpu.graph.knn import NormAdj


def edge_dropout_masks(key, n_drug: int, n_dis: int, num_ratings: int,
                       rate: float) -> Dict[str, jnp.ndarray]:
    """Per-etype keep masks for the encoder heterograph.

    Forward (drug->dis) and reverse (dis->drug) relations drop
    independent edge sets (augmentation.py:35-62 iterates etypes
    independently).
    """
    kf, kr = jax.random.split(key)
    keep = 1.0 - rate
    shape = (num_ratings, n_drug, n_dis)
    return {
        "fwd": jax.random.bernoulli(kf, keep, shape).astype(jnp.float32),
        "rev": jax.random.bernoulli(kr, keep, shape).astype(jnp.float32),
    }


def edge_addition_masks(key, graph, num_ratings: int,
                        add_rate: float) -> Dict[str, jnp.ndarray]:
    """Per-etype edge-ADD masks (reference ``add_random_edges``,
    augmentation.py:127-205: per etype, add ~add_rate * E new random
    edges, skipping duplicates).

    Dense-mask equivalent: Bernoulli over the whole grid with per-cell
    probability add_rate * E_r / (n_drug * n_dis); the GCMC layer takes
    ``A_eff = max(A_r * keep, add)``, so hits on existing edges are
    no-ops — the duplicate check for free.
    """
    n_drug, n_dis = graph.n_drug, graph.n_dis
    cells = float(n_drug * n_dis)
    e_per_rating = [jnp.sum(graph.a0()), jnp.sum(graph.a1)]
    keys = jax.random.split(key, 2 * num_ratings)
    out = {"fwd_add": [], "rev_add": []}
    for r in range(num_ratings):
        p = jnp.clip(add_rate * e_per_rating[r] / cells, 0.0, 1.0)
        out["fwd_add"].append(jax.random.bernoulli(
            keys[2 * r], p, (n_drug, n_dis)).astype(jnp.float32))
        out["rev_add"].append(jax.random.bernoulli(
            keys[2 * r + 1], p, (n_drug, n_dis)).astype(jnp.float32))
    return {k: jnp.stack(v) for k, v in out.items()}


def edge_dropout_masks_coo(key, graph, rate: float) -> Dict[str, jnp.ndarray]:
    """Per-edge keep masks for a padded-COO bipartite graph
    (graph/bipartite_coo.py): shape (R, E_pad) per direction."""
    keep = 1.0 - rate
    keys = jax.random.split(key, 2 * graph.num_ratings)
    # Per-rating pad budgets differ, so masks are per-relation tuples.
    return {
        "fwd": tuple(
            jax.random.bernoulli(keys[2 * r], keep,
                                 (graph.fwd[r].e_pad,)).astype(jnp.float32)
            for r in range(graph.num_ratings)),
        "rev": tuple(
            jax.random.bernoulli(keys[2 * r + 1], keep,
                                 (graph.rev[r].e_pad,)).astype(jnp.float32)
            for r in range(graph.num_ratings)),
    }


def prf_keep_mask(salt: jnp.ndarray, edge_id: jnp.ndarray,
                  rate: float) -> jnp.ndarray:
    """Stateless per-edge keep mask: a pure function of (salt, edge_id).

    Used by the grouped-gather layout, where each physical edge occupies
    different slots in the forward and transposed layouts — a mask that
    depends only on the edge id stays consistent across both, keeping
    the custom-VJP gradient exact.  Padding slots (edge_id == n_edges)
    also get a deterministic value; their val is 0 anyway.

    The PRF is a murmur3-style integer finaliser — not crypto, ample
    for dropout.
    """
    x = edge_id.astype(jnp.uint32) ^ salt.astype(jnp.uint32)
    x = (x ^ (x >> 16)) * jnp.uint32(0x85EBCA6B)
    x = (x ^ (x >> 13)) * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    u = x.astype(jnp.float32) * (1.0 / 4294967296.0)
    return (u >= rate).astype(jnp.float32)


def prf_mask_pair(pair, salt, rate: float):
    """Apply a PRF edge-dropout mask to BOTH layouts of a fwd/bwd
    pair (GroupedCooPair or SlabbedCooPair — anything whose layouts
    carry ``val`` + physical ``edge_id``).  Keying on the shared
    physical ids keeps the custom-VJP gradient exact: the forward and
    transposed layouts see identical drops.  Shared by every grouped/
    slabbed dispatch branch in nn/gcmc.py."""
    import dataclasses as _dc

    return _dc.replace(
        pair,
        fwd=_dc.replace(pair.fwd, val=pair.fwd.val * prf_keep_mask(
            salt, pair.fwd.edge_id, rate)),
        bwd=_dc.replace(pair.bwd, val=pair.bwd.val * prf_keep_mask(
            salt, pair.bwd.edge_id, rate)))


def edge_dropout_masks_grouped(key, graph, rate: float):
    """Per-relation salts for PRF edge dropout on a BipartiteGrouped
    encoder graph.  Forward/reverse relations drop independent sets
    (matching augmentation.py:35-62); rate rides along for the apply
    site in nn/gcmc.py."""
    r = graph.num_ratings
    salts = jax.random.randint(key, (2, r), 0, jnp.iinfo(jnp.int32).max,
                               dtype=jnp.int32).astype(jnp.uint32)
    return {"fwd_salts": salts[0], "rev_salts": salts[1],
            "rate": rate, "kind": "grouped_prf"}


def edge_dropout_masks_sharded(key, graph, rate: float):
    """Per-edge keep masks for a BipartiteSharded encoder graph: shape
    (S, E_shard) per relation per direction.  The sharded path has no
    manual transposed layout (autodiff transposes the shard_map), so
    plain iid Bernoulli draws suffice; forward/reverse relations drop
    independent sets (augmentation.py:35-62)."""
    keep = 1.0 - rate
    keys = jax.random.split(key, 2 * graph.num_ratings)
    return {
        "fwd": tuple(
            jax.random.bernoulli(keys[2 * r], keep,
                                 graph.fwd[r].val.shape)
            .astype(jnp.float32) for r in range(graph.num_ratings)),
        "rev": tuple(
            jax.random.bernoulli(keys[2 * r + 1], keep,
                                 graph.rev[r].val.shape)
            .astype(jnp.float32) for r in range(graph.num_ratings)),
    }


def sparse_edge_dropout(key, adj, rate: float):
    """Drop entries of a similarity adjacency (any layout).

    Kept entries retain their original (now stale) row-normalised
    values, matching ``random_edge_dropout_sparse``
    (augmentation.py:92-124).
    """
    import dataclasses as _dc

    from dream_gnn_tpu.graph.coo import CooGraph

    if isinstance(adj, CooGraph):
        keep = jax.random.bernoulli(key, 1.0 - rate, adj.val.shape)
        return _dc.replace(adj, val=adj.val * keep)
    keep = jax.random.bernoulli(key, 1.0 - rate, adj.a.shape)
    return NormAdj(a=adj.a * keep)


def feature_noise(key, x: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Additive Gaussian noise (augmentation.py:208-241)."""
    return x + scale * jax.random.normal(key, x.shape, x.dtype)


def graph_noise(key, adj: NormAdj, scale: float) -> NormAdj:
    """Gaussian noise on existing edge values, clamped >= 0
    (augmentation.py:244-273)."""
    nz = adj.a != 0
    noisy = jnp.maximum(adj.a + scale * jax.random.normal(key, adj.a.shape), 0.0)
    return NormAdj(a=jnp.where(nz, noisy, 0.0))


def feature_masking(key, x: jnp.ndarray, rate: float) -> jnp.ndarray:
    """Elementwise zero-masking WITHOUT rescaling (augmentation.py:276-308)."""
    mask = jax.random.uniform(key, x.shape) > rate
    return x * mask


def mixup_features(key, x: jnp.ndarray, alpha: float) -> jnp.ndarray:
    """Row mixup with Beta(alpha, alpha) coefficient (augmentation.py:311-337)."""
    kp, kl = jax.random.split(key)
    perm = jax.random.permutation(kp, x.shape[0])
    lam = jax.random.beta(kl, alpha, alpha)
    return lam * x + (1.0 - lam) * x[perm]


def augment_inputs(key, inputs, cfg: AugmentConfig, num_ratings: int = 2):
    """Apply the configured augmentation pipeline to one step's inputs.

    Mirrors the ``augment_graph_data`` dispatcher (augmentation.py:
    402-530): edge_dropout hits the encoder heterograph and all four
    similarity graphs; feature_noise hits the node embeddings
    (feature_noise_scale) and the similarity-feature rows
    (sim_noise_scale); the decoder graph is never augmented
    (train.py:269).

    Returns (augmented ModelInputs, enc edge_masks or None).
    """
    import dataclasses as _dc

    keys = jax.random.split(key, 24)
    upd = {}
    edge_masks = None
    ki = iter(range(24))

    from dream_gnn_tpu.graph.bipartite import BipartiteGraph

    for method in cfg.methods:
        if method == "edge_dropout":
            from dream_gnn_tpu.graph.grouped import BipartiteGrouped
            from dream_gnn_tpu.graph.slabbed import BipartiteSlabbed
            from dream_gnn_tpu.sharding.scale_graph import (
                BipartiteSharded, BipartiteShardedGrouped)

            if isinstance(inputs.enc_graph, BipartiteGraph):
                edge_masks = edge_dropout_masks(
                    keys[next(ki)], inputs.enc_graph.n_drug,
                    inputs.enc_graph.n_dis, num_ratings,
                    cfg.edge_dropout_rate)
            elif isinstance(inputs.enc_graph,
                            (BipartiteGrouped, BipartiteShardedGrouped,
                             BipartiteSlabbed)):
                edge_masks = edge_dropout_masks_grouped(
                    keys[next(ki)], inputs.enc_graph,
                    cfg.edge_dropout_rate)
            elif isinstance(inputs.enc_graph, BipartiteSharded):
                edge_masks = edge_dropout_masks_sharded(
                    keys[next(ki)], inputs.enc_graph,
                    cfg.edge_dropout_rate)
            else:
                edge_masks = edge_dropout_masks_coo(
                    keys[next(ki)], inputs.enc_graph,
                    cfg.edge_dropout_rate)
            for field in ("drug_graph", "dis_graph",
                          "drug_feature_graph", "dis_feature_graph"):
                g = upd.get(field, getattr(inputs, field))
                if g is not None:
                    upd[field] = sparse_edge_dropout(
                        keys[next(ki)], g, cfg.edge_dropout_rate)
        elif method == "feature_noise":
            for field, scale in (("drug_feat", cfg.feature_noise_scale),
                                 ("dis_feat", cfg.feature_noise_scale),
                                 ("drug_sim_feat", cfg.sim_noise_scale),
                                 ("dis_sim_feat", cfg.sim_noise_scale)):
                x = upd.get(field, getattr(inputs, field))
                upd[field] = feature_noise(keys[next(ki)], x, scale)
        elif method == "graph_noise":
            for field in ("drug_graph", "dis_graph",
                          "drug_feature_graph", "dis_feature_graph"):
                g = upd.get(field, getattr(inputs, field))
                if g is not None:
                    upd[field] = graph_noise(keys[next(ki)], g,
                                             cfg.graph_noise_scale)
        elif method == "feature_masking":
            for field in ("drug_feat", "dis_feat"):
                x = upd.get(field, getattr(inputs, field))
                upd[field] = feature_masking(keys[next(ki)], x,
                                             cfg.feature_mask_rate)
        elif method == "mix_up":
            for field in ("drug_feat", "dis_feat"):
                x = upd.get(field, getattr(inputs, field))
                upd[field] = mixup_features(keys[next(ki)], x,
                                            cfg.mixup_alpha)
        elif method == "add_random_edges":
            if not isinstance(inputs.enc_graph, BipartiteGraph):
                raise NotImplementedError(
                    "add_random_edges: dense-mask encoder graphs only")
            add = edge_addition_masks(keys[next(ki)], inputs.enc_graph,
                                      num_ratings, cfg.add_edge_rate)
            edge_masks = dict(edge_masks or
                              {"fwd": jnp.ones_like(add["fwd_add"]),
                               "rev": jnp.ones_like(add["rev_add"])})
            edge_masks.update(add)
        else:
            raise ValueError(f"unknown augmentation method {method!r}")

    return (_dc.replace(inputs, **upd) if upd else inputs), edge_masks

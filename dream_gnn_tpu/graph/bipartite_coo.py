"""Sparse (padded-COO) bipartite encoder graph for large-scale configs.

The dense-mask layout (graph/bipartite.py) covers the reference's tiny
datasets, where rating-0 ("no association") pairs are ~99% dense.  The
synthetic scaling config (100k x 100k nodes, ~10M edges — BASELINE.json)
cannot materialise the pair grid, so relations live as explicit
padded-COO edge lists, one per (rating, direction).  Semantics are
identical to the dense path (same GCMC math, stale-norm edge dropout as
per-edge masks); tests/test_sparse_model.py pins the two layouts to
each other.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from dream_gnn_tpu.graph.coo import coo_from_arrays
from dream_gnn_tpu.graph.norms import inv_sqrt_norm


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BipartiteCoo:
    """Relation-typed bipartite graph, padded-COO layout.

    ``fwd[r]``: drug -> disease edges of rating r (dst = disease);
    ``rev[r]``: disease -> drug edges (dst = drug).  Norm vectors follow
    data_loader.py:453-488 (degree summed over all relations).
    """

    fwd: tuple        # tuple[CooGraph], len R
    rev: tuple        # tuple[CooGraph], len R
    ci_drug: jnp.ndarray
    cj_drug: jnp.ndarray
    ci_dis: jnp.ndarray
    cj_dis: jnp.ndarray

    @property
    def n_drug(self) -> int:
        return self.rev[0].n_dst

    @property
    def n_dis(self) -> int:
        return self.fwd[0].n_dst

    @property
    def num_ratings(self) -> int:
        return len(self.fwd)

    def num_edges(self) -> float:
        return float(sum(int((g.val != 0).sum()) for g in self.fwd)
                     + sum(int((g.val != 0).sum()) for g in self.rev))


def build_enc_graph_coo(pairs: np.ndarray, values: np.ndarray,
                        n_drug: int, n_dis: int, symm: bool = True,
                        ratings: Sequence[int] = (0, 1),
                        pad_multiple: int = 512) -> BipartiteCoo:
    """Build from fold pairs; mirrors graph/bipartite.build_enc_graph."""
    pairs = np.asarray(pairs)
    values = np.asarray(values)
    fwd, rev = [], []
    for r in ratings:
        idx = np.where(values == r)[0]
        dr, di = pairs[0][idx], pairs[1][idx]
        ones = np.ones(len(idx), np.float32)
        fwd.append(coo_from_arrays(dr, di, ones, n_drug, n_dis,
                                   pad_multiple=pad_multiple))
        rev.append(coo_from_arrays(di, dr, ones, n_dis, n_drug,
                                   pad_multiple=pad_multiple))

    deg_drug = np.bincount(pairs[0], minlength=n_drug).astype(np.float32)
    deg_dis = np.bincount(pairs[1], minlength=n_dis).astype(np.float32)
    ci_drug = jnp.asarray(inv_sqrt_norm(deg_drug))
    ci_dis = jnp.asarray(inv_sqrt_norm(deg_dis))
    if symm:
        cj_drug, cj_dis = ci_drug, ci_dis
    else:
        cj_drug = jnp.ones((n_drug, 1), jnp.float32)
        cj_dis = jnp.ones((n_dis, 1), jnp.float32)
    return BipartiteCoo(fwd=tuple(fwd), rev=tuple(rev),
                        ci_drug=ci_drug, cj_drug=cj_drug,
                        ci_dis=ci_dis, cj_dis=cj_dis)


def synthetic_bipartite_coo(n_drug: int, n_dis: int, n_edges: int,
                            seed: int = 0, pos_rate: float = 0.3,
                            pad_multiple: int = 512) -> BipartiteCoo:
    """Random large bipartite graph for the scaling benchmark.

    At this scale the pair grid is not enumerable, so the edge set is an
    explicit sample; ``pos_rate`` of edges carry rating 1.
    """
    rng = np.random.default_rng(seed)
    dr = rng.integers(0, n_drug, n_edges).astype(np.int64)
    di = rng.integers(0, n_dis, n_edges).astype(np.int64)
    vals = (rng.random(n_edges) < pos_rate).astype(np.float32)
    pairs = np.stack([dr, di])
    return build_enc_graph_coo(pairs, vals, n_drug, n_dis,
                               pad_multiple=pad_multiple)

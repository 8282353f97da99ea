"""Device-resident bipartite encoder graph.

The reference builds a DGL heterograph with one edge type per rating
value plus reverse types (data_loader.py:400-490): both observed
(label-1) and unobserved (label-0) drug-disease pairs are typed edges,
so the rating-0 relation covers ~99% of all pairs.  On TPU that density
inverts the natural representation: the whole graph is a pair of dense
masks over the (n_drug, n_disease) grid, and per-relation message
passing is a dense MXU matmul —

    A_r = a1                      (rating 1)
    A_0 = mask - a1               (rating 0: in-fold pairs that are not
                                   associations)

Degree normalisation follows data_loader.py:453-488: ``ci``/``cj`` are
1/sqrt of the node degree *summed over all rating types*; zero-degree
nodes get 0 (1/sqrt(inf)).  With ``symm`` off, ``cj`` is all-ones.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from dream_gnn_tpu.graph.norms import inv_sqrt_norm


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BipartiteGraph:
    """Dense-mask bipartite graph with GCMC degree norms.

    Attributes:
      a1:   (n_drug, n_dis) float — 1.0 where an observed association
            (rating-1 pair) of this fold exists.
      mask: (n_drug, n_dis) float — 1.0 where the pair belongs to this
            fold's edge set (rating 0 or 1).
      ci_drug, cj_drug: (n_drug, 1) float — dst/src degree norms.
      ci_dis,  cj_dis:  (n_dis, 1)  float.
    """

    a1: jnp.ndarray
    mask: jnp.ndarray
    ci_drug: jnp.ndarray
    cj_drug: jnp.ndarray
    ci_dis: jnp.ndarray
    cj_dis: jnp.ndarray

    @property
    def n_drug(self) -> int:
        return self.a1.shape[0]

    @property
    def n_dis(self) -> int:
        return self.a1.shape[1]

    def a0(self) -> jnp.ndarray:
        return self.mask - self.a1

    def num_edges(self) -> jnp.ndarray:
        """Directed edge count over all relations (pairs x 2 directions)."""
        return 2.0 * jnp.sum(self.mask)


def build_enc_graph(pairs: np.ndarray, values: np.ndarray,
                    n_drug: int, n_dis: int, symm: bool = True,
                    dtype=np.float32) -> BipartiteGraph:
    """Build the encoder graph from fold pairs.

    Args:
      pairs: (2, E) int array of (drug_id, disease_id) pairs.
      values: (E,) float/int array of ratings in {0, 1}.
      symm: symmetric normalisation (reference ``gcn_agg_norm_symm``).

    Follows data_loader.py:400-490: degrees for ci/cj sum over *all*
    rating relations (a node's degree is simply the number of in-fold
    pairs incident on it).
    """
    pairs = np.asarray(pairs)
    values = np.asarray(values)
    a1 = np.zeros((n_drug, n_dis), dtype)
    mask = np.zeros((n_drug, n_dis), dtype)
    mask[pairs[0], pairs[1]] = 1.0
    pos = values > 0.5
    a1[pairs[0][pos], pairs[1][pos]] = 1.0

    deg_drug = mask.sum(axis=1)
    deg_dis = mask.sum(axis=0)
    ci_drug = inv_sqrt_norm(deg_drug)
    ci_dis = inv_sqrt_norm(deg_dis)
    if symm:
        cj_drug, cj_dis = ci_drug, ci_dis
    else:
        cj_drug = np.ones((n_drug, 1), dtype)
        cj_dis = np.ones((n_dis, 1), dtype)

    return BipartiteGraph(
        a1=jnp.asarray(a1), mask=jnp.asarray(mask),
        ci_drug=jnp.asarray(ci_drug), cj_drug=jnp.asarray(cj_drug),
        ci_dis=jnp.asarray(ci_dis), cj_dis=jnp.asarray(cj_dis))

"""Sparse-dense matmul (SpMM) — the framework's core aggregation op.

Replaces the reference's hidden native bottom layer: DGL's C++ SpMM
(``update_all(copy_u, sum)``, layers.py:229-232) and torch/cuSPARSE
``th.spmm`` (layers.py:312).

Two layouts, one semantic contract ``out[d] = sum_e val_e * x[src_e]``:

- **dense**: the aggregation matrix is materialised (n_dst, n_src) and
  the op is a single MXU matmul.  For the reference's graphs (hundreds
  of nodes; the rating-0 relation is ~99% dense) this is the
  speed-of-light layout — no gather/scatter at all.
- **coo**: padded, dst-sorted edge list + weighted ``segment_sum``.
  XLA lowers this to sort/scatter; the Pallas kernel
  (kernels/pallas_spmm.py) replaces it on the hot path for large
  graphs.

Backward passes are free: both forms are linear in ``x`` (and in the
edge weights), so jax autodiff of segment_sum / matmul already yields
the transposed-graph SpMM.
"""

from __future__ import annotations

from typing import Union

import jax
import jax.numpy as jnp

from dream_gnn_tpu.graph.coo import CooGraph
from dream_gnn_tpu.graph.knn import NormAdj


def spmm_dense(a: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Dense aggregation: ``a`` (n_dst, n_src) @ ``x`` (n_src, d)."""
    return jnp.dot(a, x, preferred_element_type=jnp.float32)


def spmm_coo(g: CooGraph, x: jnp.ndarray) -> jnp.ndarray:
    """Padded-COO aggregation via weighted segment-sum.

    Padding edges carry ``val == 0`` and point at node 0, so they
    contribute nothing.  Edges are dst-sorted (graph/coo.py), which the
    ``indices_are_sorted`` hint exploits.
    """
    msg = x[g.src] * g.val[:, None]
    return jax.ops.segment_sum(msg, g.dst, num_segments=g.n_dst,
                               indices_are_sorted=True)


def spmm(g: Union[jnp.ndarray, NormAdj, CooGraph], x: jnp.ndarray) -> jnp.ndarray:
    """Layout-dispatching SpMM."""
    if isinstance(g, CooGraph):
        return spmm_coo(g, x)
    if isinstance(g, NormAdj):
        return spmm_dense(g.a, x)
    return spmm_dense(g, x)

"""Padded-COO graph layout for the large-scale sparse path.

The dense-mask layout (graph/bipartite.py, graph/knn.py) is ideal for
the reference's tiny datasets, but the synthetic scaling config
(100k x 100k nodes, ~10M edges — BASELINE.json) needs a sparse
edge-list layout with *static shapes*: edges are padded to a fixed
budget and carry a validity weight, so edge dropout / augmentation is a
mask update, never a rebuild (the reference rebuilds DGL graphs on the
host every iteration, augmentation.py:13-89).

Edges are kept sorted by destination row so the Pallas segment-sum
kernel streams contiguous destination tiles.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CooGraph:
    """Static-shape COO graph: (E_pad,) src/dst/val arrays.

    ``val`` is the edge weight; padding rows have ``val == 0`` and point
    at node 0, so a weighted segment-sum ignores them for free.
    """

    src: jnp.ndarray            # (E_pad,) int32 — source node ids
    dst: jnp.ndarray            # (E_pad,) int32 — destination node ids
    val: jnp.ndarray            # (E_pad,) float — edge weights (0 = padding)
    n_src: int = dataclasses.field(metadata=dict(static=True))
    n_dst: int = dataclasses.field(metadata=dict(static=True))

    @property
    def e_pad(self) -> int:
        return self.src.shape[0]


def _pad_to(x: np.ndarray, n: int, fill=0):
    out = np.full((n,), fill, x.dtype)
    out[: x.shape[0]] = x
    return out


def coo_from_arrays(src: np.ndarray, dst: np.ndarray, val: np.ndarray,
                    n_src: int, n_dst: int,
                    pad_to: int | None = None,
                    pad_multiple: int = 512) -> CooGraph:
    """Build a dst-sorted, padded CooGraph from host edge arrays."""
    src = np.asarray(src, np.int32)
    dst = np.asarray(dst, np.int32)
    val = np.asarray(val, np.float32)
    order = np.argsort(dst, kind="stable")
    src, dst, val = src[order], dst[order], val[order]
    e = src.shape[0]
    budget = pad_to if pad_to is not None else -(-max(e, 1) // pad_multiple) * pad_multiple
    if e > budget:
        raise ValueError(f"edge count {e} exceeds pad budget {budget}")
    # Pad dst with the LAST segment id so the array stays sorted —
    # spmm_coo passes indices_are_sorted=True and a violated hint is
    # implementation-defined scatter behaviour.  Pad val is 0, so the
    # extra contributions vanish.
    return CooGraph(
        src=jnp.asarray(_pad_to(src, budget)),
        dst=jnp.asarray(_pad_to(dst, budget, fill=n_dst - 1)),
        val=jnp.asarray(_pad_to(val, budget)),
        n_src=n_src, n_dst=n_dst)


def coo_from_dense(a: np.ndarray, pad_to: int | None = None,
                   pad_multiple: int = 512) -> CooGraph:
    """COO view of a dense aggregation matrix.

    Matches matmul semantics ``out = a @ x``: ``a[d, s]`` is the weight
    of the edge s -> d (row = destination, column = source), so
    ``spmm(coo_from_dense(a), x) == a @ x``.
    """
    a = np.asarray(a)
    d, s = np.nonzero(a)
    return coo_from_arrays(s, d, a[d, s], a.shape[1], a.shape[0],
                           pad_to=pad_to, pad_multiple=pad_multiple)

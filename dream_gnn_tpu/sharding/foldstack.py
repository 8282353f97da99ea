"""Fold stacking: identical-shape folds -> one batched pytree.

Folds of a KFold split differ in edge count by at most one element per
class, so stacking pads every fold's decoder edge list to a common
budget and carries a per-edge weight (1 real / 0 pad) that the
weighted loss consumes.  The stacked axis is the data-parallel mesh
axis: N folds train simultaneously, one per device group — the
reference runs them strictly sequentially (train.py:500).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from dream_gnn_tpu.data.loader import DreamDataset
from dream_gnn_tpu.model.dream_gnn import ModelInputs
from dream_gnn_tpu.train.loop import fold_inputs


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StackedFolds:
    """Fold-stacked training arrays: every leaf has leading axis F."""

    inputs: ModelInputs
    labels: jnp.ndarray          # (F, E_pad)
    edge_weight: jnp.ndarray     # (F, E_pad) — 0 on padding

    @property
    def n_folds(self) -> int:
        return self.labels.shape[0]


def _pad_1d(x: np.ndarray, n: int, fill=0):
    out = np.full((n,), fill, x.dtype)
    out[: x.shape[0]] = x
    return out


def stack_folds(dataset: DreamDataset, folds: Sequence[int],
                pad_multiple: int = 128, side: str = "train") -> StackedFolds:
    """Stack the train (default) or test side of the given folds.

    ``side='test'`` stacks the evaluation inputs: the *test* encoder
    graph with the test candidate pairs (parity trap SURVEY §7.3.1 —
    test evaluation runs the encoder on the test enc graph).
    """
    per_fold = [fold_inputs(dataset, cv) for cv in folds]
    if side == "train":
        sel = [(t[0], t[2], dataset.fold(cv).train_w)
               for t, cv in zip(per_fold, folds)]
    elif side == "test":
        sel = [(t[1], t[3], dataset.fold(cv).test_w)
               for t, cv in zip(per_fold, folds)]
    else:
        raise ValueError(f"side must be 'train' or 'test', got {side!r}")
    e_max = max(int(t[0].dec_src.shape[0]) for t in sel)
    e_pad = -(-e_max // pad_multiple) * pad_multiple

    stacked_inputs = []
    labels = []
    weights = []
    for train_in, train_lab, w_in in sel:
        e = int(train_in.dec_src.shape[0])
        # Padding edges point at node 0 (gather stays in-bounds) and get
        # zero loss weight.  Folds already padded by the loader carry
        # their own validity weights.
        src = _pad_1d(np.asarray(train_in.dec_src), e_pad)
        dst = _pad_1d(np.asarray(train_in.dec_dst), e_pad)
        stacked_inputs.append(dataclasses.replace(
            train_in, dec_src=jnp.asarray(src), dec_dst=jnp.asarray(dst)))
        labels.append(_pad_1d(np.asarray(train_lab), e_pad))
        w = np.zeros((e_pad,), np.float32)
        w[:e] = 1.0 if w_in is None else np.asarray(w_in)[:e]
        weights.append(w)

    inputs = jax.tree.map(lambda *xs: jnp.stack(xs), *stacked_inputs)
    return StackedFolds(inputs=inputs,
                        labels=jnp.asarray(np.stack(labels)),
                        edge_weight=jnp.asarray(np.stack(weights)))

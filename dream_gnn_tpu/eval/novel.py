"""Novel-prediction reporting (reference ``get_top_novel_predictions``,
train.py:26-151).

Scores every zero cell of the association matrix with the trained
model — encoder on the *train* encoder graph (train.py:80-84) — applies
a sigmoid, and writes the top-k pairs (with drug names when available)
to CSV.

The reference batches candidate pairs 5000 at a time and rebuilds a DGL
decoder graph per batch; here all candidates are scored in one jitted
forward (the decoder is two row-gathers + a tiny MLP per edge, so even
the full 763x681 grid is trivial on a TPU chip).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax
import numpy as np

from dream_gnn_tpu.config import ModelConfig
from dream_gnn_tpu.data.loader import DreamDataset
from dream_gnn_tpu.model.dream_gnn import forward
from dream_gnn_tpu.train.loop import fold_inputs


def get_top_novel_predictions(params, model_cfg: ModelConfig,
                              dataset: DreamDataset, cv: int,
                              top_k: int = 200,
                              save_path: Optional[str] = None,
                              use_augmentation: bool = False,
                              augment_cfg=None,
                              augment_key=None):
    """Returns a list of dicts {drug_id, disease_id, score[, drug_name]}.

    ``use_augmentation``: reference --use_augmentation — apply one
    loader-side feature-augmentation draw (noise -> masking [-> mixup])
    to the node features fed to the forward (data_loader.py:518,559 via
    get_graph_data_for_training, train.py:87-93).
    """
    train_inputs, _, _, _ = fold_inputs(dataset, cv)
    if use_augmentation:
        key = augment_key if augment_key is not None else jax.random.key(0)
        drug_feat, dis_feat = dataset.augment_features(key, augment_cfg)
        train_inputs = dataclasses.replace(
            train_inputs, drug_feat=drug_feat, dis_feat=dis_feat)

    assoc = np.asarray(dataset.raw.association)
    zr, zc = np.nonzero(assoc == 0)
    if model_cfg.decode_mode == "grid":
        # Grid decode scores every cell at once; select the zero cells.
        pred, *_ = jax.jit(
            lambda p, x: forward(p, x, model_cfg, train=False))(
            params, train_inputs)
        scores = np.asarray(jax.nn.sigmoid(pred))[zr, zc]
    else:
        candidates = dataclasses.replace(
            train_inputs,
            dec_src=jax.numpy.asarray(zr, jax.numpy.int32),
            dec_dst=jax.numpy.asarray(zc, jax.numpy.int32))
        pred, *_ = jax.jit(
            lambda p, x: forward(p, x, model_cfg, train=False))(
            params, candidates)
        scores = np.asarray(jax.nn.sigmoid(pred))

    order = np.argsort(-scores)[:top_k]
    rows = []
    for i in order:
        row = dict(drug_id=int(zr[i]), disease_id=int(zc[i]),
                   score=float(scores[i]))
        if dataset.raw.drug_ids is not None:
            row["drug_name"] = dataset.raw.drug_ids[int(zr[i])]
        rows.append(row)

    if save_path:
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        cols = list(rows[0].keys()) if rows else [
            "drug_id", "disease_id", "score"]
        with open(save_path, "w") as f:
            f.write(",".join(cols) + "\n")
            for row in rows:
                f.write(",".join(str(row[c]) for c in cols) + "\n")
    return rows

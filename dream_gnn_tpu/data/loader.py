"""Dataset assembly: raw data -> device-resident fold arrays.

TPU re-design of the reference ``DrugDataLoader`` (data_loader.py:41-597).
Host-side numpy builds splits and graph layouts once; everything the
train loop touches is a static-shape jnp array.

Reference parity notes:
- node features are the L2-row-normalised pretrained embeddings
  (data_loader.py:205-228);
- the FGCN inputs are the *raw* similarity-matrix rows;
- the "fold-specific" similarity/feature kNN graphs are in fact
  fold-invariant (built from full matrices every fold; SURVEY.md
  §7.3.11) — built once here;
- the test encoder graph is built from the *test* pairs with their true
  labels as edge types and is what evaluation runs on (parity trap
  §7.3.1).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from dream_gnn_tpu.data.splits import FoldSplit, make_cv_splits
from dream_gnn_tpu.data.synthetic import RawData, synthetic_raw_data
from dream_gnn_tpu.graph.bipartite import BipartiteGraph, build_enc_graph
from dream_gnn_tpu.graph.knn import NormAdj, feature_knn_graph, knn_sim_graph


@dataclasses.dataclass(frozen=True)
class FoldData:
    """Arrays for one CV fold.

    With ``pad_folds`` (loader option) the decoder edge lists are padded
    to dataset-wide budgets so every fold shares one compiled shape;
    ``train_w``/``test_w`` are 1/0 validity weights consumed by the
    weighted loss and masked metrics.
    """

    train_enc: BipartiteGraph
    train_src: jnp.ndarray          # (E_train,) int32, pair order
    train_dst: jnp.ndarray
    train_labels: jnp.ndarray       # (E_train,) float32
    test_enc: BipartiteGraph
    test_src: jnp.ndarray
    test_dst: jnp.ndarray
    test_labels: jnp.ndarray
    train_w: Optional[jnp.ndarray] = None
    test_w: Optional[jnp.ndarray] = None


class DreamDataset:
    """Loads/generates a dataset and materialises all folds."""

    def __init__(self, raw: RawData, *, k: int = 4, symm: bool = True,
                 n_folds: int = 10, kfold_seed: int = 1024,
                 pad_folds: bool = True,
                 embedding_mode: str = "pretrained",
                 embedding_seed: int = 0):
        self.raw = raw
        self.n_drug = raw.n_drug
        self.n_dis = raw.n_dis
        self.k = k
        self.symm = symm
        self.pad_folds = pad_folds

        # Features: L2-normalised embeddings (data_loader.py:221-222).
        def _l2(x):
            n = np.linalg.norm(x, axis=1, keepdims=True)
            n[n == 0] = 1.0
            return (x / n).astype(np.float32)

        if embedding_mode == "random":
            # Reference --embedding_mode random: N(0, 0.1) 768-d node
            # features instead of pretrained embeds (data_loader.py:
            # 209-218); the kNN *feature* graphs still use the raw
            # embeds (built before _generate_feat in the reference).
            rng = np.random.default_rng(embedding_seed)
            self.drug_feat = jnp.asarray(_l2(
                rng.normal(0, 0.1, (raw.n_drug, 768))))
            self.dis_feat = jnp.asarray(_l2(
                rng.normal(0, 0.1, (raw.n_dis, 768))))
        elif embedding_mode == "pretrained":
            self.drug_feat = jnp.asarray(_l2(raw.drug_embed))
            self.dis_feat = jnp.asarray(_l2(raw.dis_embed))
        else:
            raise ValueError(f"embedding_mode must be 'pretrained' or "
                             f"'random', got {embedding_mode!r}")
        self.drug_sim_feat = jnp.asarray(raw.drug_sim, jnp.float32)
        self.dis_sim_feat = jnp.asarray(raw.dis_sim, jnp.float32)

        # Fold-invariant kNN graphs (built once; see module docstring).
        self.drug_graph: NormAdj = knn_sim_graph(raw.drug_sim, k, symm)
        self.dis_graph: NormAdj = knn_sim_graph(raw.dis_sim, k, symm)
        self.drug_feature_graph: NormAdj = feature_knn_graph(raw.drug_embed, k, symm)
        self.dis_feature_graph: NormAdj = feature_knn_graph(raw.dis_embed, k, symm)

        self.splits: Dict[int, FoldSplit] = make_cv_splits(
            raw.association, n_folds=n_folds, seed=kfold_seed)
        self._folds: Dict[int, FoldData] = {}

    @classmethod
    def load(cls, name_or_path: str, *, k: int = 4, symm: bool = True,
             n_folds: int = 10, kfold_seed: int = 1024,
             synthetic_seed: Optional[int] = None,
             embedding_mode: str = "pretrained") -> "DreamDataset":
        """Load a .mat file, or generate a synthetic preset by name."""
        if name_or_path.endswith(".mat"):
            from dream_gnn_tpu.data.matio import load_mat
            raw = load_mat(name_or_path)
        else:
            raw = synthetic_raw_data(name_or_path,
                                     seed=synthetic_seed or 0)
        return cls(raw, k=k, symm=symm, n_folds=n_folds,
                   embedding_mode=embedding_mode,
                   kfold_seed=kfold_seed)

    # Property API parity with the reference loader
    # (/root/reference/data_loader.py:584-597).  ``num_drug``/
    # ``num_disease`` duplicate the ctor attributes under the reference
    # names; ``num_links`` is the number of distinct association values
    # (len(np.unique(association_matrix)) — 2 for binary data).
    @property
    def num_drug(self) -> int:
        return self.n_drug

    @property
    def num_disease(self) -> int:
        return self.n_dis

    @property
    def num_links(self) -> int:
        return int(len(np.unique(self.raw.association)))

    def augment_features(self, key, augment_cfg=None):
        """Loader-side feature augmentation (data_loader.py:511-542):
        Gaussian noise -> masking -> optional mixup over the normalised
        node features.  Used by the novel-prediction path when
        ``--use_augmentation`` is on; the train loop's per-iteration
        augmentation lives in augment/masks.py instead."""
        import jax

        from dream_gnn_tpu.augment.masks import (feature_masking,
                                                 feature_noise,
                                                 mixup_features)
        from dream_gnn_tpu.config import AugmentConfig

        cfg = augment_cfg or AugmentConfig()
        keys = jax.random.split(key, 6)
        drug = feature_noise(keys[0], self.drug_feat,
                             cfg.feature_noise_scale)
        dis = feature_noise(keys[1], self.dis_feat,
                            cfg.feature_noise_scale)
        drug = feature_masking(keys[2], drug, cfg.feature_mask_rate)
        dis = feature_masking(keys[3], dis, cfg.feature_mask_rate)
        if "mix_up" in cfg.methods:
            drug = mixup_features(keys[4], drug, cfg.mixup_alpha)
            dis = mixup_features(keys[5], dis, cfg.mixup_alpha)
        return drug, dis

    def _edge_budgets(self):
        """Dataset-wide (train, test) edge budgets: max over folds,
        rounded up — one compiled shape serves every fold."""
        tr = max(s.train_pairs.shape[1] for s in self.splits.values())
        te = max(s.test_pairs.shape[1] for s in self.splits.values())
        rnd = lambda x: -(-x // 256) * 256  # noqa: E731
        return rnd(tr), rnd(te)

    def fold(self, cv: int) -> FoldData:
        if cv not in self._folds:
            s = self.splits[cv]

            def _pad(pairs, values, budget):
                e = pairs.shape[1]
                if not self.pad_folds:
                    return (jnp.asarray(pairs[0], jnp.int32),
                            jnp.asarray(pairs[1], jnp.int32),
                            jnp.asarray(values), None)
                src = np.zeros(budget, np.int32)
                dst = np.zeros(budget, np.int32)
                lab = np.zeros(budget, np.float32)
                w = np.zeros(budget, np.float32)
                src[:e], dst[:e] = pairs[0], pairs[1]
                lab[:e] = values
                w[:e] = 1.0
                return (jnp.asarray(src), jnp.asarray(dst),
                        jnp.asarray(lab), jnp.asarray(w))

            b_tr, b_te = self._edge_budgets() if self.pad_folds else (0, 0)
            tr_src, tr_dst, tr_lab, tr_w = _pad(s.train_pairs,
                                                s.train_values, b_tr)
            te_src, te_dst, te_lab, te_w = _pad(s.test_pairs,
                                                s.test_values, b_te)
            self._folds[cv] = FoldData(
                train_enc=build_enc_graph(s.train_pairs, s.train_values,
                                          self.n_drug, self.n_dis, self.symm),
                train_src=tr_src, train_dst=tr_dst, train_labels=tr_lab,
                test_enc=build_enc_graph(s.test_pairs, s.test_values,
                                         self.n_drug, self.n_dis, self.symm),
                test_src=te_src, test_dst=te_dst, test_labels=te_lab,
                train_w=tr_w, test_w=te_w,
            )
        return self._folds[cv]

"""CV split parity (data_loader.py:136-203)."""

import numpy as np
from sklearn.model_selection import KFold

from dream_gnn_tpu.data.splits import make_cv_splits
from dream_gnn_tpu.data.synthetic import synthetic_raw_data


def test_split_structure():
    raw = synthetic_raw_data(n_drug=50, n_dis=40, n_pos=100, seed=3)
    splits = make_cv_splits(raw.association)
    n_pairs = 50 * 40
    for cv, s in splits.items():
        # Positives first, then negatives (the label-order contract).
        n_pos_train = int(s.train_values.sum())
        assert (s.train_values[:n_pos_train] == 1).all()
        assert (s.train_values[n_pos_train:] == 0).all()
        # Train/test partition all pairs with no overlap.
        train_set = set(map(tuple, s.train_pairs.T))
        test_set = set(map(tuple, s.test_pairs.T))
        assert not train_set & test_set
        assert len(train_set) + len(test_set) == n_pairs
        # Labels match the association matrix.
        for pairs, values in ((s.train_pairs, s.train_values),
                              (s.test_pairs, s.test_values)):
            np.testing.assert_array_equal(
                raw.association[pairs[0], pairs[1]], values)


def test_split_matches_reference_kfold():
    """Same KFold(shuffle, random_state=1024) applied to pos/neg
    index arrays separately."""
    raw = synthetic_raw_data(n_drug=30, n_dis=20, n_pos=60, seed=1)
    splits = make_cv_splits(raw.association)

    interactions = raw.association
    pos_row, pos_col = np.nonzero(interactions)
    neg_row, neg_col = np.nonzero(1 - interactions)
    kfold = KFold(n_splits=10, shuffle=True, random_state=1024)
    for cv, ((tr_p, te_p), (tr_n, te_n)) in enumerate(
            zip(kfold.split(pos_row), kfold.split(neg_row))):
        expected_train = np.concatenate(
            [np.stack([pos_row[tr_p], pos_col[tr_p]]),
             np.stack([neg_row[tr_n], neg_col[tr_n]])], axis=1)
        np.testing.assert_array_equal(splits[cv].train_pairs, expected_train)


def test_loader_property_api():
    """Reference property parity: num_drug / num_disease / num_links
    (/root/reference/data_loader.py:584-597)."""
    from dream_gnn_tpu.data.loader import DreamDataset

    raw = synthetic_raw_data(n_drug=30, n_dis=20, n_pos=60, seed=1)
    ds = DreamDataset(raw, pad_folds=False)
    assert ds.num_drug == 30
    assert ds.num_disease == 20
    # Binary association matrix -> two distinct link values.
    assert ds.num_links == 2

"""JAX metrics vs sklearn (the reference's evaluation.py:60-65)."""

import numpy as np
import pytest

from dream_gnn_tpu.utils.metrics import aupr, auroc, roc_aupr_host


def _random_case(rng, n, tie_prob=0.0, pos_rate=0.3):
    y = (rng.random(n) < pos_rate).astype(np.float32)
    s = rng.normal(size=n).astype(np.float32)
    if tie_prob > 0:
        # Quantise to force ties.
        s = np.round(s, 1)
    return y, s


@pytest.mark.parametrize("n,tie_prob", [(50, 0.0), (500, 0.0), (500, 1.0),
                                        (2000, 1.0), (101, 0.0)])
def test_auroc_matches_sklearn(rng, n, tie_prob):
    y, s = _random_case(rng, n, tie_prob)
    ref_roc, _ = roc_aupr_host(y, s)
    assert float(auroc(y, s)) == pytest.approx(ref_roc, abs=1e-6)


@pytest.mark.parametrize("n,tie_prob", [(50, 0.0), (500, 0.0), (500, 1.0),
                                        (2000, 1.0), (101, 0.0)])
def test_aupr_matches_sklearn(rng, n, tie_prob):
    y, s = _random_case(rng, n, tie_prob)
    _, ref_pr = roc_aupr_host(y, s)
    assert float(aupr(y, s)) == pytest.approx(ref_pr, abs=1e-6)


def test_aupr_differs_from_average_precision(rng):
    """The reference uses trapezoidal auc(recall, precision), NOT
    average precision (SURVEY.md §7.3.9) — guard that we implement the
    former."""
    from sklearn.metrics import average_precision_score

    y, s = _random_case(rng, 300, tie_prob=1.0)
    ours = float(aupr(y, s))
    ap = average_precision_score(y, s)
    _, ref_pr = roc_aupr_host(y, s)
    assert ours == pytest.approx(ref_pr, abs=1e-6)
    assert abs(ours - ap) > 1e-9  # distinct definitions on tied data


def test_perfect_and_inverted(rng):
    y = np.array([0, 0, 1, 1], np.float32)
    s = np.array([0.1, 0.2, 0.8, 0.9], np.float32)
    assert float(auroc(y, s)) == pytest.approx(1.0)
    assert float(aupr(y, s)) == pytest.approx(1.0)
    assert float(auroc(y, -s)) == pytest.approx(0.0)


@pytest.mark.parametrize("n,n_pad", [(200, 56), (500, 12), (333, 200)])
def test_masked_metrics_match_subset(rng, n, n_pad):
    """Masked variants over a padded array == plain metrics on the
    valid subset (sklearn-checked)."""
    from dream_gnn_tpu.utils.metrics import aupr_masked, auroc_masked

    y = (rng.random(n + n_pad) < 0.3).astype(np.float32)
    s = np.round(rng.normal(size=n + n_pad), 1).astype(np.float32)
    valid = np.zeros(n + n_pad, np.float32)
    idx = rng.choice(n + n_pad, n, replace=False)
    valid[idx] = 1.0

    ref_roc, ref_pr = roc_aupr_host(y[idx.astype(int)], s[idx.astype(int)])
    assert float(auroc_masked(y, s, valid)) == pytest.approx(ref_roc,
                                                             abs=1e-6)
    assert float(aupr_masked(y, s, valid)) == pytest.approx(ref_pr,
                                                            abs=1e-6)

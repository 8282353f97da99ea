"""AUROC / AUPR, both on-device (pure JAX) and host (sklearn).

The reference computes metrics on host with sklearn every 250 iters
(evaluation.py:60-65).  Parity trap (SURVEY.md §7.3.9): AUPR is
``auc(recall, precision)`` — trapezoidal area over the PR curve — not
average precision.

The JAX versions below reproduce sklearn's tie handling exactly
(tie-grouped thresholds, PR curve truncated at first full recall,
final (recall=0, precision=1) point) so the jitted/vmapped experiment
harness can evaluate without host round-trips; ``roc_aupr_host`` wraps
sklearn for the canonical CSV numbers.  Parity is enforced by
tests/test_metrics.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _average_ranks(scores: jnp.ndarray) -> jnp.ndarray:
    """1-based ranks of ``scores`` with ties assigned their average rank."""
    n = scores.shape[0]
    order = jnp.argsort(scores)  # ascending
    ss = scores[order]
    idx = jnp.arange(n)
    new_group = jnp.concatenate([jnp.ones((1,), bool), ss[1:] != ss[:-1]])
    last_of_group = jnp.concatenate([ss[1:] != ss[:-1], jnp.ones((1,), bool)])
    group_start = jax.lax.cummax(jnp.where(new_group, idx, -1), axis=0)
    group_end = jax.lax.cummin(jnp.where(last_of_group, idx, n), axis=0,
                               reverse=True)
    avg_rank_sorted = (group_start + group_end).astype(scores.dtype) / 2.0 + 1.0
    return jnp.zeros(n, scores.dtype).at[order].set(avg_rank_sorted)


@jax.jit
def auroc(y_true: jnp.ndarray, y_score: jnp.ndarray) -> jnp.ndarray:
    """ROC AUC via the tie-corrected Mann-Whitney statistic.

    Equals sklearn's trapezoidal ``auc(roc_curve(...))`` exactly
    (collinear intermediate points do not change the area).
    """
    y = y_true.astype(jnp.float32)
    ranks = _average_ranks(y_score.astype(jnp.float32))
    n_pos = jnp.sum(y)
    n_neg = y.shape[0] - n_pos
    rank_sum = jnp.sum(ranks * y)
    return (rank_sum - n_pos * (n_pos + 1.0) / 2.0) / (n_pos * n_neg)


@jax.jit
def aupr(y_true: jnp.ndarray, y_score: jnp.ndarray) -> jnp.ndarray:
    """Trapezoidal area under the PR curve, sklearn-equivalent.

    Mirrors ``metrics.auc(*metrics.precision_recall_curve(...)[1::-1])``:
    one point per distinct threshold (ties grouped), curve truncated at
    the first threshold attaining full recall, closed with (0, 1).
    """
    n = y_true.shape[0]
    y = y_true.astype(jnp.float32)
    s = y_score.astype(jnp.float32)

    order = jnp.argsort(-s)  # descending score
    ss = s[order]
    ys = y[order]
    idx = jnp.arange(n)

    tp = jnp.cumsum(ys)
    n_pos = tp[-1]
    predicted = idx.astype(jnp.float32) + 1.0
    precision = tp / predicted
    recall = tp / n_pos

    # Last element of each tie group is the point reported at that threshold.
    kept = jnp.concatenate([ss[:-1] != ss[1:], jnp.ones((1,), bool)])
    # Truncate after the first kept point reaching full recall
    # (sklearn precision_recall_curve slices at tps.searchsorted(tps[-1])).
    full = kept & (tp >= n_pos)
    first_full = jnp.min(jnp.where(full, idx, n))
    valid = kept & (idx <= first_full)

    # Previous valid point for each position (or the synthetic (r=0, p=1)).
    prev_idx = jnp.concatenate([
        jnp.full((1,), -1, idx.dtype),
        jax.lax.cummax(jnp.where(valid, idx, -1), axis=0)[:-1],
    ])
    has_prev = prev_idx >= 0
    safe_prev = jnp.maximum(prev_idx, 0)
    r_prev = jnp.where(has_prev, recall[safe_prev], 0.0)
    p_prev = jnp.where(has_prev, precision[safe_prev], 1.0)

    contrib = (recall - r_prev) * (precision + p_prev) / 2.0
    return jnp.sum(jnp.where(valid, contrib, 0.0))


@jax.jit
def auroc_masked(y_true, y_score, valid):
    """AUROC over the subset where ``valid > 0`` (static shapes).

    Invalid points are pushed to score -inf/label 0; they then occupy
    the lowest ranks, so each positive's rank is inflated by exactly
    n_invalid — subtracted in closed form.  Enables padded fold-stacked
    evaluation without per-fold shapes.
    """
    valid = valid > 0
    y = jnp.where(valid, y_true, 0.0).astype(jnp.float32)
    s = jnp.where(valid, y_score, -jnp.inf).astype(jnp.float32)
    n_inv = jnp.sum(~valid).astype(jnp.float32)
    ranks = _average_ranks(s)
    n_pos = jnp.sum(y)
    n_neg = y.shape[0] - n_inv - n_pos
    rank_sum = jnp.sum(ranks * y) - n_pos * n_inv
    return (rank_sum - n_pos * (n_pos + 1.0) / 2.0) / (n_pos * n_neg)


@jax.jit
def aupr_masked(y_true, y_score, valid):
    """AUPR over the subset where ``valid > 0``.

    Invalid points (score -inf, label 0) sort after every valid point
    and the PR curve truncates at first full recall, so the standard
    computation is exact as-is.
    """
    valid = valid > 0
    return aupr(jnp.where(valid, y_true, 0.0),
                jnp.where(valid, y_score, -jnp.inf))


def roc_aupr_host(y_true, y_score):
    """sklearn-backed (AUROC, AUPR) — the reference's exact computation
    (evaluation.py:60-65)."""
    from sklearn import metrics as _m

    y_true = np.asarray(y_true)
    y_score = np.asarray(y_score)
    fpr, tpr, _ = _m.roc_curve(y_true, y_score)
    roc = _m.auc(fpr, tpr)
    precision, recall, _ = _m.precision_recall_curve(y_true, y_score)
    pr = _m.auc(recall, precision)
    return float(roc), float(pr)

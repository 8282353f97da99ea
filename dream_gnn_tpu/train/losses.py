"""Loss functions (reference train.py:15-23,289-294 + utils.py:87-95)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray,
                    smoothing: float = 0.0, weight=None) -> jnp.ndarray:
    """Mean BCE-with-logits; optional label smoothing
    (``LabelSmoothingBCELoss``: ``t*(1-s) + s/2``, train.py:20-23).

    ``weight`` enables padded edge lists (fold-stacked training): the
    mean runs over weight mass instead of element count.
    """
    if smoothing > 0.0:
        targets = targets * (1.0 - smoothing) + smoothing * 0.5
    # Numerically stable: max(x,0) - x*t + log1p(exp(-|x|))
    loss = (jnp.maximum(logits, 0.0) - logits * targets
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    if weight is None:
        return jnp.mean(loss)
    return jnp.sum(loss * weight) / jnp.sum(weight)


def common_loss(emb1: jnp.ndarray, emb2: jnp.ndarray) -> jnp.ndarray:
    """Covariance-alignment loss between the two routes (utils.py:87-95):
    MSE between the N x N Gram matrices of centred, row-L2-normalised
    embeddings."""
    def _norm_cov(e):
        e = e - jnp.mean(e, axis=0, keepdims=True)
        n = jnp.linalg.norm(e, axis=1, keepdims=True)
        e = e / jnp.maximum(n, 1e-12)   # F.normalize eps
        return jnp.dot(e, e.T, preferred_element_type=jnp.float32)

    return jnp.mean((_norm_cov(emb1) - _norm_cov(emb2)) ** 2)


def total_loss(pred, labels, drug_out, drug_sim_out, dis_out, dis_sim_out, *,
               beta: float, smoothing: float = 0.0, weight=None):
    """BCE + beta * (common_drug + common_dis) (train.py:289-294)."""
    rel = bce_with_logits(pred, labels, smoothing, weight)
    if beta == 0.0:        # static: compile out the N x N grams entirely
        return rel, rel
    com = common_loss(drug_out, drug_sim_out) + common_loss(dis_out, dis_sim_out)
    return rel + beta * com, rel

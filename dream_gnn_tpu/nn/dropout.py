"""Functional inverted dropout (torch ``nn.Dropout`` semantics)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dropout(key, x: jnp.ndarray, rate: float, train: bool) -> jnp.ndarray:
    """Zero elements with prob ``rate`` and scale survivors by 1/(1-rate).

    ``train`` is a Python bool resolved at trace time — eval-mode
    forwards compile with dropout fully elided.
    """
    if not train or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)

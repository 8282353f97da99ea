"""Activation registry (reference utils.py:47-80)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


_ACTS = {
    "leaky": lambda x: jax.nn.leaky_relu(x, negative_slope=0.1),
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "softsign": jax.nn.soft_sign,
    "gelu": jax.nn.gelu,
    "elu": jax.nn.elu,
    "selu": jax.nn.selu,
    "none": lambda x: x,
}


def get_activation(act):
    """Return the activation callable for ``act``.

    Accepts a name from the registry, ``None`` (identity), or a
    callable (passed through) — mirroring reference utils.py:47-80.
    """
    if act is None:
        return _ACTS["none"]
    if callable(act):
        return act
    try:
        return _ACTS[act]
    except KeyError:
        raise NotImplementedError(f"unknown activation {act!r}")

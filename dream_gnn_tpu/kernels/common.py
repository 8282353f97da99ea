"""Shared kernel helpers."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def onehot3(ids, n, dtype):
    """(R, 128) ids -> (R, 128, n) one-hot; Mosaic-friendly 3D compare
    (no 1D vector ops)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, ids.shape + (n,), 2)
    return (ids[:, :, None] == iota).astype(dtype)

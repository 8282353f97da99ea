"""Route-fusion attention (reference ``Attention``, layers.py:324-338).

One shared module fuses the GCMC (topology) and FGCN (feature) routes
per node: project to a scalar via Linear(d,16) -> tanh -> Linear(16,1,
no bias), softmax over the route axis, dropout **on the attention
weights** (parity quirk), weighted sum.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from dream_gnn_tpu.nn import init as init_lib
from dream_gnn_tpu.nn.dropout import dropout


def attention_init(key, *, in_size: int, hidden_size: int = 16):
    k1, k2 = jax.random.split(key)
    w1, b1 = init_lib.torch_linear(k1, in_size, hidden_size)
    w2, _ = init_lib.torch_linear(k2, hidden_size, 1, bias=False)
    return {"w1": w1, "b1": b1, "w2": w2}


def attention_apply(params, z: jnp.ndarray, *, dropout_rate: float,
                    train: bool = False, key: Optional[jax.Array] = None):
    """z: (N, routes, d) -> fused (N, d), beta (N, routes, 1)."""
    w = jnp.tanh(z @ params["w1"] + params["b1"]) @ params["w2"]
    beta = jax.nn.softmax(w, axis=1)
    if train:
        beta = dropout(key, beta, dropout_rate, train)
    return jnp.sum(beta * z, axis=1), beta

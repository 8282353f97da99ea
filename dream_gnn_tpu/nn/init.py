"""Parameter initialisers matching the reference's *distributions*.

Metric parity (AUROC/AUPR over the seed protocol) needs matching init
statistics, not bit-identical draws.  Three distributions appear in the
reference:

- ``xavier_uniform`` — GCMC att/basis/fc weights via the blanket
  ``reset_parameters`` loop over params with dim > 1 (layers.py:112-115);
- torch ``nn.Linear`` default — kaiming_uniform(a=sqrt(5)) which reduces
  to U(+-1/sqrt(fan_in)) for weights, with bias U(+-1/sqrt(fan_in))
  (attention / decoder / fusion linears);
- U(+-1/sqrt(out_features)) — ``GraphConvolution`` weight & bias
  (layers.py:300-304).

All weights here use the (in, out) JAX layout (``y = x @ w + b``).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def xavier_uniform(key, shape, dtype=jnp.float32):
    """torch ``xavier_uniform_`` fans: for ndim>2, fan_in/out use
    dims[1]/dims[0] times the trailing receptive field."""
    if len(shape) < 2:
        raise ValueError("xavier needs >=2 dims")
    receptive = math.prod(shape[2:]) if len(shape) > 2 else 1
    fan_in = shape[1] * receptive
    fan_out = shape[0] * receptive
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return uniform(key, shape, bound, dtype)


def xavier_linear(key, in_features, out_features, dtype=jnp.float32):
    """(in, out) weight with xavier bounds (symmetric in fan order)."""
    bound = math.sqrt(6.0 / (in_features + out_features))
    return uniform(key, (in_features, out_features), bound, dtype)


def torch_linear(key, in_features, out_features, bias=True, dtype=jnp.float32):
    """torch ``nn.Linear`` default init: U(+-1/sqrt(fan_in)) for both."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_features)
    w = uniform(kw, (in_features, out_features), bound, dtype)
    if not bias:
        return w, None
    b = uniform(kb, (out_features,), bound, dtype)
    return w, b


def gcn_linear(key, in_features, out_features, bias=True, dtype=jnp.float32):
    """Reference ``GraphConvolution.reset_parameters``: U(+-1/sqrt(out))."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(out_features)
    w = uniform(kw, (in_features, out_features), bound, dtype)
    if not bias:
        return w, None
    b = uniform(kb, (out_features,), bound, dtype)
    return w, b

"""Per-edge MLP decoder (reference ``MLPDecoder``, layers.py:341-379).

The reference gathers ``concat(src_h, dst_h)`` per candidate edge via
DGL ``apply_edges`` (a C++ SDDMM-style gather) and runs a
256 -> 128 -> 64 -> 1 MLP, emitting **logits** (the Sigmoid member is
never applied in forward — parity quirk, layers.py:347).

TPU re-design: the first Linear is algebraically split across the
concat —

    lin1(concat(u, v)) = u @ W1[:d] + v @ W1[d:] + b1

so the (E, 2d) concat is never materialised: we precompute the two
(N, 128) node projections on the MXU and the per-edge work collapses to
two row-gathers and an add.  Edge order equals candidate-pair order
(labels are matched by position — SURVEY.md §7.3.8).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from dream_gnn_tpu.nn import init as init_lib
from dream_gnn_tpu.nn.dropout import dropout


def decoder_init(key, *, in_units: int, hidden1: int = 128, hidden2: int = 64):
    k1, k2, k3 = jax.random.split(key, 3)
    w1, b1 = init_lib.torch_linear(k1, 2 * in_units, hidden1)
    w2, b2 = init_lib.torch_linear(k2, hidden1, hidden2)
    w3, b3 = init_lib.torch_linear(k3, hidden2, 1)
    return {"w1": w1, "b1": b1, "w2": w2, "b2": b2, "w3": w3, "b3": b3}


def decoder_apply(params, edge_src: jnp.ndarray, edge_dst: jnp.ndarray,
                  drug_feat: jnp.ndarray, dis_feat: jnp.ndarray, *,
                  dropout_rate: float, train: bool = False,
                  key: Optional[jax.Array] = None,
                  dtype=jnp.float32) -> jnp.ndarray:
    """Score candidate edges.

    Args:
      edge_src: (E,) drug ids; edge_dst: (E,) disease ids — in candidate
        pair order.
      dtype: matmul operand dtype (bf16 halves the per-edge HBM traffic
        that dominates the step); accumulation stays float32.
    Returns logits of shape (E,).
    """
    d = drug_feat.shape[1]
    proj_drug = jnp.dot(drug_feat.astype(dtype), params["w1"][:d].astype(dtype),
                        preferred_element_type=jnp.float32)
    proj_dis = jnp.dot(dis_feat.astype(dtype), params["w1"][d:].astype(dtype),
                       preferred_element_type=jnp.float32)
    h = jax.nn.relu(proj_drug[edge_src] + proj_dis[edge_dst] + params["b1"])
    if train:
        k1, k2 = jax.random.split(key)
        h = dropout(k1, h, dropout_rate, train)
    h = jax.nn.relu(jnp.dot(h.astype(dtype), params["w2"].astype(dtype),
                            preferred_element_type=jnp.float32) + params["b2"])
    if train:
        h = dropout(k2, h, dropout_rate, train)
    out = jnp.dot(h.astype(dtype), params["w3"].astype(dtype),
                  preferred_element_type=jnp.float32) + params["b3"]
    return out[:, 0]


def decoder_apply_grid(params, drug_feat: jnp.ndarray,
                       dis_feat: jnp.ndarray, *, dropout_rate: float,
                       train: bool = False,
                       key: Optional[jax.Array] = None,
                       dtype=jnp.float32) -> jnp.ndarray:
    """Score EVERY (drug, disease) cell as a dense grid.

    At reference scale the candidate edge set covers ~90% of the full
    drug x disease grid (rating-0 pairs are candidates too,
    data_loader.py:423-446), so decoding the whole grid costs ~11% more
    MLP FLOPs than the edge list but removes the per-edge gathers
    entirely: ``lin1(concat(u, v)) = u@W1[:d] + v@W1[d:] + b1`` becomes
    an outer sum of the two node projections.  Out-of-fold cells are
    masked by the loss/metric weights, exactly like padded edges.

    Returns logits of shape (n_drug, n_disease); ``grid[i, j]`` equals
    ``decoder_apply`` on edge (i, j) in eval mode (tested).  Dropout
    draws per-cell instead of per-edge — same distribution, different
    stream.
    """
    d = drug_feat.shape[1]
    proj_drug = jnp.dot(drug_feat.astype(dtype), params["w1"][:d].astype(dtype),
                        preferred_element_type=jnp.float32)
    proj_dis = jnp.dot(dis_feat.astype(dtype), params["w1"][d:].astype(dtype),
                       preferred_element_type=jnp.float32)
    h = jax.nn.relu(proj_drug[:, None, :] + proj_dis[None, :, :]
                    + params["b1"])
    if train:
        k1, k2 = jax.random.split(key)
        h = dropout(k1, h, dropout_rate, train)
    h = jax.nn.relu(jnp.dot(h.astype(dtype), params["w2"].astype(dtype),
                            preferred_element_type=jnp.float32)
                    + params["b2"])
    if train:
        h = dropout(k2, h, dropout_rate, train)
    out = jnp.dot(h.astype(dtype), params["w3"].astype(dtype),
                  preferred_element_type=jnp.float32) + params["b3"]
    return out[:, :, 0]

"""Edge-partitioned SpMM vs the unsharded path (8-device CPU mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dream_gnn_tpu.graph.coo import coo_from_dense
from dream_gnn_tpu.kernels.spmm import spmm_coo, spmm_dense
from dream_gnn_tpu.sharding.edge_partition import (put_sharded_coo,
                                                   shard_coo_by_dst,
                                                   spmm_sharded)
from dream_gnn_tpu.sharding.mesh import make_mesh


@pytest.mark.parametrize("n_dst,n_src,d,shards", [(64, 48, 16, 4),
                                                  (100, 80, 8, 8),
                                                  (37, 29, 4, 4)])
def test_sharded_matches_dense(rng, n_dst, n_src, d, shards):
    a = ((rng.random((n_dst, n_src)) < 0.15)
         * rng.random((n_dst, n_src))).astype(np.float32)
    x = rng.normal(size=(n_src, d)).astype(np.float32)
    expected = np.asarray(spmm_dense(jnp.asarray(a), jnp.asarray(x)))

    g = coo_from_dense(a)
    mesh = make_mesh(dp=shards, mp=1)
    sg = put_sharded_coo(mesh, "dp", shard_coo_by_dst(g, shards))

    # Replicated-x variant.
    out_rep = np.asarray(spmm_sharded(mesh, "dp", sg, jnp.asarray(x),
                                      x_sharded=False))[:n_dst]
    np.testing.assert_allclose(out_rep, expected, rtol=1e-5, atol=1e-5)

    # Sharded-x (halo exchange) variant.
    out_halo = np.asarray(spmm_sharded(mesh, "dp", sg, jnp.asarray(x),
                                       x_sharded=True))[:n_dst]
    np.testing.assert_allclose(out_halo, expected, rtol=1e-5, atol=1e-5)


def test_sharded_grad(rng):
    """Autodiff flows through shard_map + halo exchange."""
    n_dst, n_src, d, shards = 32, 24, 8, 4
    a = ((rng.random((n_dst, n_src)) < 0.2)
         * rng.random((n_dst, n_src))).astype(np.float32)
    x = jnp.asarray(rng.normal(size=(n_src, d)).astype(np.float32))
    g = coo_from_dense(a)
    mesh = make_mesh(dp=shards, mp=1)
    sg = put_sharded_coo(mesh, "dp", shard_coo_by_dst(g, shards))

    def f_sharded(x):
        return jnp.sum(spmm_sharded(mesh, "dp", sg, x, x_sharded=False)
                       ** 2)

    def f_ref(x):
        return jnp.sum(spmm_coo(g, x) ** 2)

    g1 = jax.grad(f_sharded)(x)
    g2 = jax.grad(f_ref)(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-5)

"""Blocked Pallas SpMM vs segment-sum reference (CPU interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dream_gnn_tpu.kernels.pallas_spmm as ps
from dream_gnn_tpu.graph.blocked import (blocked_from_coo,
                                         blocked_pair_from_coo)
from dream_gnn_tpu.graph.coo import coo_from_dense
from dream_gnn_tpu.kernels.spmm import spmm_coo, spmm_dense


@pytest.fixture(autouse=True)
def _interpret():
    old = ps.INTERPRET
    ps.INTERPRET = True
    yield
    ps.INTERPRET = old


def _rand_graph(rng, n_dst, n_src, density):
    a = ((rng.random((n_dst, n_src)) < density)
         * rng.random((n_dst, n_src))).astype(np.float32)
    return a, coo_from_dense(a)


@pytest.mark.parametrize("n_dst,n_src,density", [
    (600, 700, 0.01),        # multiple tiles both dims
    (100, 90, 0.05),         # single tile
    (1200, 300, 0.002),      # sparse, some empty dst tiles likely
])
def test_blocked_matches_dense(rng, n_dst, n_src, density):
    a, g = _rand_graph(rng, n_dst, n_src, density)
    x = rng.normal(size=(n_src, 128)).astype(np.float32)
    expected = np.asarray(spmm_dense(jnp.asarray(a), jnp.asarray(x)))
    out = ps._spmm_blocked_raw(blocked_from_coo(g), jnp.asarray(x),
                               dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), expected,
                               rtol=1e-4, atol=1e-4)


def test_empty_dst_tiles_zeroed(rng):
    # All edges land in dst rows < TILE_DST; rows beyond must be 0.
    n_dst = 2 * 512 + 100
    a = np.zeros((n_dst, 64), np.float32)
    a[:100] = (rng.random((100, 64)) < 0.1).astype(np.float32)
    g = coo_from_dense(a)
    x = rng.normal(size=(64, 128)).astype(np.float32)
    out = np.asarray(ps._spmm_blocked_raw(blocked_from_coo(g),
                                          jnp.asarray(x),
                                          dtype=jnp.float32))
    expected = a @ x
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-4)
    assert (out[512:] == 0).all()


def test_blocked_grad_is_transpose(rng):
    a, g = _rand_graph(rng, 300, 250, 0.02)
    pair = blocked_pair_from_coo(g)
    x = jnp.asarray(rng.normal(size=(250, 128)).astype(np.float32))

    def f(x):
        return jnp.sum(ps.spmm_blocked(pair, x, jnp.float32) ** 2)

    grad = jax.grad(f)(x)
    expected = 2.0 * a.T @ (a @ np.asarray(x))
    np.testing.assert_allclose(np.asarray(grad), expected,
                               rtol=1e-3, atol=1e-3)

"""SpMM kernel parity: padded-COO segment-sum vs dense matmul."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dream_gnn_tpu.graph.coo import coo_from_arrays, coo_from_dense
from dream_gnn_tpu.kernels.spmm import spmm, spmm_coo, spmm_dense


def _random_agg_matrix(rng, n_dst, n_src, density=0.1):
    a = (rng.random((n_dst, n_src)) < density) * rng.random((n_dst, n_src))
    return a.astype(np.float32)


@pytest.mark.parametrize("n_dst,n_src,d", [(7, 5, 3), (64, 128, 32),
                                           (200, 150, 17)])
def test_coo_matches_dense(rng, n_dst, n_src, d):
    a = _random_agg_matrix(rng, n_dst, n_src)
    x = rng.normal(size=(n_src, d)).astype(np.float32)
    dense = spmm_dense(jnp.asarray(a), jnp.asarray(x))
    coo = coo_from_dense(a)
    sparse = spmm_coo(coo, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(sparse), np.asarray(dense),
                               rtol=1e-5, atol=1e-5)


def test_padding_is_ignored(rng):
    a = _random_agg_matrix(rng, 10, 12)
    x = rng.normal(size=(12, 4)).astype(np.float32)
    g_tight = coo_from_dense(a, pad_to=int((a != 0).sum()))
    g_padded = coo_from_dense(a, pad_to=4096)
    out1 = spmm_coo(g_tight, jnp.asarray(x))
    out2 = spmm_coo(g_padded, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               rtol=1e-6, atol=1e-6)


def test_spmm_gradient_is_transposed_spmm(rng):
    """Autodiff through segment-sum must equal A^T @ g."""
    a = _random_agg_matrix(rng, 9, 11)
    x = rng.normal(size=(11, 5)).astype(np.float32)
    g = coo_from_dense(a)

    def f(x):
        return jnp.sum(spmm_coo(g, x) ** 2)

    grad = jax.grad(f)(jnp.asarray(x))
    expected = 2.0 * a.T @ (a @ x)
    np.testing.assert_allclose(np.asarray(grad), expected, rtol=1e-4,
                               atol=1e-4)


def test_dispatch(rng):
    a = _random_agg_matrix(rng, 6, 6)
    x = rng.normal(size=(6, 3)).astype(np.float32)
    out_d = spmm(jnp.asarray(a), jnp.asarray(x))
    out_c = spmm(coo_from_dense(a), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_d),
                               rtol=1e-5, atol=1e-5)


def test_coo_from_arrays_duplicate_edges():
    """Duplicate (src, dst) entries must accumulate."""
    g = coo_from_arrays(np.array([0, 0, 1]), np.array([1, 1, 0]),
                        np.array([1.0, 2.0, 3.0]), n_src=2, n_dst=2)
    x = jnp.asarray(np.eye(2, dtype=np.float32))
    out = np.asarray(spmm_coo(g, x))
    np.testing.assert_allclose(out, np.array([[0.0, 3.0], [3.0, 0.0]]))

"""Slab-streamed gather SpMM (v3) vs dense reference — CPU interpret.

Parity contract (kernels/pallas_spmm_slab.py): for any COO graph,
``spmm_slab(pair, x)`` must equal the dense scatter-add
``out[n] = sum_e val_e * x[src_e]`` and its VJP must equal the
transposed scatter-add — across uneven shapes, empty slabs, the
packed-bf16 panel path, and padding slots (val=0 never contributes).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dream_gnn_tpu.kernels.pallas_spmm_slab as pss
from dream_gnn_tpu.graph.slabbed import (auto_geometry,
                                         slabbed_from_arrays,
                                         slabbed_pair_from_arrays)


@pytest.fixture(autouse=True)
def _interpret():
    old = pss.INTERPRET
    pss.INTERPRET = True
    yield
    pss.INTERPRET = old


def _dense_ref(src, dst, val, x, n_dst):
    out = np.zeros((n_dst, x.shape[1]), np.float32)
    np.add.at(out, dst, val[:, None] * x[src])
    return out


CASES = [
    # (n_src, n_dst, e, d, tile, span, window)
    (1000, 900, 5000, 16, 256, 4, 3),
    (5000, 3000, 20000, 32, 256, 8, 3),
    (700, 700, 300, 16, 256, 4, 3),       # sparse -> empty slabs
    (300, 5000, 2000, 16, 512, 2, 2),     # n_src << n_dst
    (4000, 250, 9000, 16, 256, 8, 4),     # single dst tile
]


@pytest.mark.parametrize("ns,nd,e,d,tile,span,window", CASES)
def test_forward_matches_dense(ns, nd, e, d, tile, span, window):
    rng = np.random.default_rng(ns + e)
    src = rng.integers(0, ns, e)
    dst = rng.integers(0, nd, e)
    val = (rng.random(e) + 0.5).astype(np.float32)
    x = rng.normal(size=(ns, d)).astype(np.float32)
    g = slabbed_from_arrays(src, dst, val, ns, nd, tile=tile,
                            span=span, window=window)
    out = np.asarray(pss._spmm_slab_raw(g, jnp.asarray(x),
                                        dtype=jnp.float32))
    ref = _dense_ref(src, dst, val, x, nd)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_zero_weight_edges_are_dropped():
    """val==0 edges are stripped at build; a graph whose every edge is
    masked must produce exactly zero output (incl. untouched slabs)."""
    rng = np.random.default_rng(3)
    ns = nd = 600
    src = rng.integers(0, ns, 100)
    dst = rng.integers(0, nd, 100)
    x = rng.normal(size=(ns, 8)).astype(np.float32)
    g = slabbed_from_arrays(src, dst, np.zeros(100, np.float32), ns, nd,
                            tile=256, span=2, window=2)
    assert g.n_live == 0
    out = np.asarray(pss._spmm_slab_raw(g, jnp.asarray(x),
                                        dtype=jnp.float32))
    np.testing.assert_allclose(out, 0.0)


def test_packed_bf16_path():
    rng = np.random.default_rng(11)
    ns = nd = 2000
    e, d = 10000, 32
    src = rng.integers(0, ns, e)
    dst = rng.integers(0, nd, e)
    val = (rng.random(e) + 0.5).astype(np.float32)
    x = rng.normal(size=(ns, d)).astype(np.float32)
    g = slabbed_from_arrays(src, dst, val, ns, nd, tile=256, span=8,
                            window=3)
    out = np.asarray(pss._spmm_slab_raw(g, jnp.asarray(x),
                                        dtype=jnp.bfloat16))
    ref = _dense_ref(src, dst, val, x, nd)
    np.testing.assert_allclose(out, ref, rtol=3e-2, atol=3e-2 *
                               np.abs(ref).max())


def test_grad_matches_transposed_scatter():
    rng = np.random.default_rng(7)
    ns, nd, e, d = 1500, 1200, 8000, 16
    src = rng.integers(0, ns, e)
    dst = rng.integers(0, nd, e)
    val = (rng.random(e) + 0.5).astype(np.float32)
    x = rng.normal(size=(ns, d)).astype(np.float32)
    pair = slabbed_pair_from_arrays(src, dst, val, ns, nd, tile=256,
                                    span=4, window=3)
    ref = _dense_ref(src, dst, val, x, nd)

    gx = jax.grad(lambda y: jnp.sum(
        pss.spmm_slab(pair, y, jnp.float32) ** 2))(jnp.asarray(x))
    gout = 2 * ref
    gx_ref = np.zeros_like(x)
    np.add.at(gx_ref, src, val[:, None] * gout[dst])
    np.testing.assert_allclose(np.asarray(gx), gx_ref, rtol=1e-4,
                               atol=1e-4 * np.abs(gx_ref).max())


def test_auto_geometry_prefers_small_tiles_when_dense():
    tile, span, window = auto_geometry(10_000_000, 100_000, 100_000)
    assert tile == 256 and window <= 8
    # Sparse relation (3M @ 100k^2) climbs to a taller tile rather
    # than blowing the window budget.
    tile_s, _, window_s = auto_geometry(3_000_000, 100_000, 100_000)
    assert window_s <= 8


def test_builder_rejects_overwide_span():
    with pytest.raises(ValueError, match="span"):
        slabbed_from_arrays(np.arange(10), np.arange(10),
                            np.ones(10, np.float32), 100_000, 100,
                            span=256)

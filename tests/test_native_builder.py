"""Native (C++) blocked-layout builder vs the NumPy reference."""

import numpy as np
import pytest

from dream_gnn_tpu.graph import native
from dream_gnn_tpu.graph.blocked import (EDGE_CHUNK, TILE_DST, TILE_SRC,
                                         blocked_from_arrays)

pytestmark = pytest.mark.skipif(not native.is_available(),
                                reason="native builder not built")


def _dense_from_blocked(b):
    """Reconstruct the dense aggregation matrix from a BlockedCoo."""
    a = np.zeros((b.n_dst, b.n_src), np.float32)
    c_src = np.asarray(b.src_local)
    c_dst = np.asarray(b.dst_local)
    c_val = np.asarray(b.val)
    c_st = np.asarray(b.src_tile)
    c_dt = np.asarray(b.dst_tile)
    for i in range(b.n_chunks):
        live = c_val[i] != 0
        s = c_st[i] * TILE_SRC + c_src[i][live]
        d = c_dt[i] * TILE_DST + c_dst[i][live]
        np.add.at(a, (d, s), c_val[i][live])
    return a


@pytest.mark.parametrize("n_dst,n_src,n_edges", [(600, 700, 3000),
                                                 (1200, 300, 500),
                                                 (100, 90, 50),
                                                 (2000, 2000, 40000)])
def test_native_matches_numpy(rng, n_dst, n_src, n_edges):
    src = rng.integers(0, n_src, n_edges).astype(np.int32)
    dst = rng.integers(0, n_dst, n_edges).astype(np.int32)
    val = (rng.random(n_edges) + 0.5).astype(np.float32)

    b_native = blocked_from_arrays(src, dst, val, n_src, n_dst,
                                   use_native=True)
    b_numpy = blocked_from_arrays(src, dst, val, n_src, n_dst,
                                  use_native=False)

    # Semantically identical: both reconstruct the same matrix (chunk
    # internals may order duplicate edges differently).
    a1 = _dense_from_blocked(b_native)
    a2 = _dense_from_blocked(b_numpy)
    np.testing.assert_allclose(a1, a2, rtol=1e-6)
    # Structural invariants.
    assert b_native.n_chunks >= -(-n_dst // TILE_DST)
    first = np.asarray(b_native.first_of_dst)
    dts = np.asarray(b_native.dst_tile)
    assert (np.diff(dts) >= 0).all()          # dst-tile sorted
    # first flag exactly at dst-tile changes
    expect_first = np.concatenate([[1], (dts[1:] != dts[:-1]).astype(int)])
    np.testing.assert_array_equal(first, expect_first)
    # every dst tile present
    assert set(dts.tolist()) == set(range(-(-n_dst // TILE_DST)))


@pytest.mark.skipif(not native.grouped_available(),
                    reason="native grouped builder not built")
@pytest.mark.parametrize("span,window", [(16, None), (8, 2), (2, None)])
@pytest.mark.parametrize("n_dst,n_src,n_edges", [(600, 700, 3000),
                                                 (1200, 300, 500),
                                                 (100, 90, 50),
                                                 (2000, 2000, 40000)])
def test_native_grouped_bit_matches_numpy(rng, n_dst, n_src, n_edges,
                                          span, window):
    """The C++ grouped builder reproduces the NumPy layout EXACTLY
    (same stable sort, same group/window/chunk assembly, same packed
    meta, same edge ids)."""
    from dream_gnn_tpu.graph.grouped import grouped_from_arrays

    src = rng.integers(0, n_src, n_edges).astype(np.int32)
    dst = rng.integers(0, n_dst, n_edges).astype(np.int32)
    val = (rng.random(n_edges) + 0.5).astype(np.float32)
    # include padding zeros
    val[:: 17] = 0.0

    g_n = grouped_from_arrays(src, dst, val, n_src, n_dst, span=span,
                              window=window, use_native=True)
    g_p = grouped_from_arrays(src, dst, val, n_src, n_dst, span=span,
                              window=window, use_native=False)
    for field in ("src_local", "dst_local", "val", "edge_id", "g_meta",
                  "trans_sb", "dst_tile", "first_of_dst"):
        np.testing.assert_array_equal(
            np.asarray(getattr(g_n, field)),
            np.asarray(getattr(g_p, field)), err_msg=field)
    assert (g_n.n_src, g_n.n_dst) == (g_p.n_src, g_p.n_dst)


def test_native_drops_padding(rng):
    src = np.array([0, 1, 2, 3], np.int32)
    dst = np.array([0, 1, 2, 3], np.int32)
    val = np.array([1.0, 0.0, 2.0, 0.0], np.float32)  # padding zeros
    b = blocked_from_arrays(src, dst, val, 4, 4, use_native=True)
    a = _dense_from_blocked(b)
    assert a[0, 0] == 1.0 and a[2, 2] == 2.0
    assert a.sum() == 3.0

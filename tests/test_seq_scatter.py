"""Sequential-slab scatter (kernels/pallas_seq_scatter.py) vs the
dense scatter-add — CPU interpret.

The kernel serves the scale decoder's table gradients: a node-sorted
slot stream scattered into node rows without the (1M, 128) -> packed
transposed relayout the grouped-gather path needs (measured at
4.11 ms alone, scripts/probe_scale_decoder_phases.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dream_gnn_tpu.kernels.pallas_seq_scatter as pseq
from dream_gnn_tpu.kernels.pallas_seq_scatter import (SEQ_BATCH,
                                                      build_seq_scatter,
                                                      seq_scatter)


@pytest.fixture(autouse=True)
def _interpret():
    old = pseq.INTERPRET
    pseq.INTERPRET = True
    yield
    pseq.INTERPRET = old


def _case(rng, n_slots, n_dst, d, pad_frac):
    n_live = int(n_slots * (1 - pad_frac))
    nodes_live = np.sort(rng.integers(0, n_dst, n_live))
    live = np.zeros(n_slots, bool)
    live[np.sort(rng.choice(n_slots, n_live, replace=False))] = True
    node_of_slot = np.zeros(n_slots, np.int64)
    node_of_slot[live] = nodes_live
    val = np.where(live, rng.random(n_slots).astype(np.float32) + 0.5,
                   0.0).astype(np.float32)
    x = rng.normal(size=(n_slots, d)).astype(np.float32)
    ref = np.zeros((n_dst, d), np.float32)
    np.add.at(ref, node_of_slot[live], val[live, None] * x[live])
    return node_of_slot, live, val, x, ref


CASES = [
    (10000, 900, 16, 0.1),     # multi-batch tiles + clamped tail
    (5000, 3000, 32, 0.0),     # no padding slots
    (3000, 257, 16, 0.3),      # single partial tile, heavy padding
    (2000, 5000, 16, 0.05),    # many EMPTY tiles (stub batches)
    (1500, 900, 16, 0.2),      # stream shorter than SEQ_BATCH
]


@pytest.mark.parametrize("n_slots,n_dst,d,pad", CASES)
def test_matches_dense_scatter(n_slots, n_dst, d, pad):
    rng = np.random.default_rng(n_slots + n_dst)
    node_of_slot, live, val, x, ref = _case(rng, n_slots, n_dst, d, pad)
    g = build_seq_scatter(node_of_slot, live, val, n_dst)
    out = np.asarray(seq_scatter(g, jnp.asarray(x), dtype=jnp.float32))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_clamped_tail_does_not_double_count():
    """The last batch of the stream clamps its DMA window back so it
    stays inside the padded array — the slid-back region overlaps the
    previous batch and must be masked out, not scattered twice."""
    rng = np.random.default_rng(0)
    n_dst = 300
    n_slots = SEQ_BATCH + 7        # forces one clamped batch
    node_of_slot = np.sort(rng.integers(0, n_dst, n_slots))
    val = np.ones(n_slots, np.float32)
    x = rng.normal(size=(n_slots, 8)).astype(np.float32)
    g = build_seq_scatter(node_of_slot, np.ones(n_slots, bool), val,
                          n_dst)
    out = np.asarray(seq_scatter(g, jnp.asarray(x), dtype=jnp.float32))
    ref = np.zeros((n_dst, 8), np.float32)
    np.add.at(ref, node_of_slot, x)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_empty_tile_rows_are_zero():
    rng = np.random.default_rng(1)
    n_dst = 2000                   # nodes only in [0, 100)
    node_of_slot = np.sort(rng.integers(0, 100, 500))
    g = build_seq_scatter(node_of_slot, np.ones(500, bool),
                          np.ones(500, np.float32), n_dst)
    x = rng.normal(size=(500, 8)).astype(np.float32)
    out = np.asarray(seq_scatter(g, jnp.asarray(x), dtype=jnp.float32))
    np.testing.assert_allclose(out[512:], 0.0)

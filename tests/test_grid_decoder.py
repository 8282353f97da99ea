"""Dense-grid decoder: XLA reference vs per-edge decoder, and the
fused Pallas grid kernel vs both (CPU interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dream_gnn_tpu.kernels.pallas_decoder as pd
import dream_gnn_tpu.kernels.pallas_grid_decoder as pgd
from dream_gnn_tpu.nn.decoder import (decoder_apply, decoder_apply_grid,
                                      decoder_init)


@pytest.fixture(autouse=True)
def _interpret():
    old = pd.INTERPRET
    pd.INTERPRET = True
    yield
    pd.INTERPRET = old


@pytest.fixture
def setup(rng):
    nd, nv, d = 37, 23, 16
    params = decoder_init(jax.random.key(0), in_units=d)
    drug_feat = jnp.asarray(rng.normal(size=(nd, d)).astype(np.float32))
    dis_feat = jnp.asarray(rng.normal(size=(nv, d)).astype(np.float32))
    return params, drug_feat, dis_feat


def test_grid_matches_edge_decoder(setup):
    """grid[i, j] == per-edge decoder on edge (i, j) (eval mode)."""
    params, drug_feat, dis_feat = setup
    nd, nv = drug_feat.shape[0], dis_feat.shape[0]
    grid = decoder_apply_grid(params, drug_feat, dis_feat,
                              dropout_rate=0.0, train=False)
    assert grid.shape == (nd, nv)
    src, dst = np.meshgrid(np.arange(nd), np.arange(nv), indexing="ij")
    edge = decoder_apply(params, jnp.asarray(src.ravel()),
                         jnp.asarray(dst.ravel()), drug_feat, dis_feat,
                         dropout_rate=0.0, train=False)
    np.testing.assert_allclose(np.asarray(grid).ravel(), np.asarray(edge),
                               rtol=1e-5, atol=1e-5)


def test_fused_grid_matches_xla_grid(setup):
    params, drug_feat, dis_feat = setup
    ref = decoder_apply_grid(params, drug_feat, dis_feat,
                             dropout_rate=0.0, train=False)
    out = pgd.decoder_apply_grid_fused(params, drug_feat, dis_feat,
                                       dropout_rate=0.0, train=False,
                                       dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_grid_grads_match_xla(setup):
    params, drug_feat, dis_feat = setup

    def loss_ref(params, df, vf):
        out = decoder_apply_grid(params, df, vf, dropout_rate=0.0,
                                 train=False)
        return jnp.sum(jnp.sin(out))       # non-trivial cotangent

    def loss_fused(params, df, vf):
        out = pgd.decoder_apply_grid_fused(
            params, df, vf, dropout_rate=0.0, train=True,
            key=jax.random.key(3), dtype=jnp.float32)
        return jnp.sum(jnp.sin(out))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(params, drug_feat,
                                                  dis_feat)
    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(params, drug_feat,
                                                      dis_feat)
    for name in params:
        np.testing.assert_allclose(
            np.asarray(g_fused[0][name]), np.asarray(g_ref[0][name]),
            rtol=1e-4, atol=1e-5, err_msg=f"d{name}")
    np.testing.assert_allclose(np.asarray(g_fused[1]), np.asarray(g_ref[1]),
                               rtol=1e-4, atol=1e-5, err_msg="ddrug_feat")
    np.testing.assert_allclose(np.asarray(g_fused[2]), np.asarray(g_ref[2]),
                               rtol=1e-4, atol=1e-5, err_msg="ddis_feat")


def test_fused_grid_large_padded(rng):
    """Non-multiple-of-tile sizes pad correctly."""
    nd, nv, d = 131, 261, 8
    params = decoder_init(jax.random.key(1), in_units=d)
    drug_feat = jnp.asarray(rng.normal(size=(nd, d)).astype(np.float32))
    dis_feat = jnp.asarray(rng.normal(size=(nv, d)).astype(np.float32))
    ref = decoder_apply_grid(params, drug_feat, dis_feat,
                             dropout_rate=0.0, train=False)
    out = pgd.decoder_apply_grid_fused(params, drug_feat, dis_feat,
                                       dropout_rate=0.0, train=False,
                                       dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

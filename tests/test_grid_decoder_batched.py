"""Fold-batched fused grid decoder vs per-fold references (CPU
interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dream_gnn_tpu.kernels.pallas_decoder as pd
import dream_gnn_tpu.kernels.pallas_grid_decoder as pgd
from dream_gnn_tpu.nn.decoder import decoder_apply_grid, decoder_init


@pytest.fixture(autouse=True)
def _interpret():
    old = pd.INTERPRET
    pd.INTERPRET = True
    yield
    pd.INTERPRET = old


@pytest.fixture
def setup(rng):
    f, nd, nv, d = 3, 21, 17, 16
    params = [decoder_init(jax.random.key(s), in_units=d) for s in range(f)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *params)
    drug_feat = jnp.asarray(rng.normal(size=(f, nd, d)).astype(np.float32))
    dis_feat = jnp.asarray(rng.normal(size=(f, nv, d)).astype(np.float32))
    return params, stacked, drug_feat, dis_feat


def test_batched_eval_matches_xla_grid(setup):
    params, stacked, drug_feat, dis_feat = setup
    out = pgd.decoder_apply_grid_fused_batched(
        stacked, drug_feat, dis_feat, dropout_rate=0.0, train=False,
        dtype=jnp.float32)
    assert out.shape == (3, drug_feat.shape[1], dis_feat.shape[1])
    for i, p in enumerate(params):
        ref = decoder_apply_grid(p, drug_feat[i], dis_feat[i],
                                 dropout_rate=0.0, train=False)
        np.testing.assert_allclose(np.asarray(out[i]), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=f"fold {i}")


def test_batched_grads_match_xla_per_fold(setup):
    params, stacked, drug_feat, dis_feat = setup

    def loss_b(stacked, df, vf):
        out = pgd.decoder_apply_grid_fused_batched(
            stacked, df, vf, dropout_rate=0.0, train=True,
            key=jax.vmap(jax.random.key)(jnp.arange(3, dtype=jnp.uint32)),
            dtype=jnp.float32)
        return jnp.sum(jnp.sin(out))

    g_b = jax.grad(loss_b, argnums=(0, 1, 2))(stacked, drug_feat, dis_feat)
    for i, p in enumerate(params):
        def loss_ref(p, df, vf):
            out = decoder_apply_grid(p, df, vf, dropout_rate=0.0,
                                     train=False)
            return jnp.sum(jnp.sin(out))

        g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(p, drug_feat[i],
                                                    dis_feat[i])
        for name in p:
            np.testing.assert_allclose(
                np.asarray(g_b[0][name][i]), np.asarray(g_r[0][name]),
                rtol=1e-4, atol=1e-5, err_msg=f"fold {i} d{name}")
        np.testing.assert_allclose(np.asarray(g_b[1][i]), np.asarray(g_r[1]),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=f"fold {i} ddrug")
        np.testing.assert_allclose(np.asarray(g_b[2][i]), np.asarray(g_r[2]),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=f"fold {i} ddis")

"""Fold-batched fused decoder vs per-fold single kernel / XLA decoder
(CPU interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dream_gnn_tpu.kernels.pallas_decoder as pd
import dream_gnn_tpu.kernels.pallas_decoder_batched as pdb
from dream_gnn_tpu.nn.decoder import decoder_apply, decoder_init


@pytest.fixture(autouse=True)
def _interpret():
    old = pd.INTERPRET
    pd.INTERPRET = True
    yield
    pd.INTERPRET = old


@pytest.fixture
def setup(rng):
    f, nd, nv, d, e = 3, 37, 23, 16, 300
    params = [decoder_init(jax.random.key(s), in_units=d) for s in range(f)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *params)
    drug_feat = jnp.asarray(rng.normal(size=(f, nd, d)).astype(np.float32))
    dis_feat = jnp.asarray(rng.normal(size=(f, nv, d)).astype(np.float32))
    src = jnp.asarray(rng.integers(0, nd, (f, e)).astype(np.int32))
    dst = jnp.asarray(rng.integers(0, nv, (f, e)).astype(np.int32))
    return params, stacked, drug_feat, dis_feat, src, dst


def test_eval_matches_xla_per_fold(setup):
    params, stacked, drug_feat, dis_feat, src, dst = setup
    out = pdb.decoder_apply_fused_batched(
        stacked, src, dst, drug_feat, dis_feat, dropout_rate=0.0,
        train=False, dtype=jnp.float32)
    assert out.shape == src.shape
    for i, p in enumerate(params):
        ref = decoder_apply(p, src[i], dst[i], drug_feat[i], dis_feat[i],
                            dropout_rate=0.0, train=False)
        np.testing.assert_allclose(np.asarray(out[i]), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=f"fold {i}")


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="on-core prng_seed has no CPU interpret rule "
                           "(run on TPU via scripts/check_dropout_tpu.py)")
def test_dropout_stream_matches_single_kernel(setup):
    """Same per-fold seed => same on-core PRNG stream as a single-fold
    kernel launch (seed_ref[f] + tile id)."""
    params, stacked, drug_feat, dis_feat, src, dst = setup
    seeds = jnp.asarray([11, 22, 33], jnp.int32)
    d = drug_feat.shape[2]

    def _proj(p, feat, lo, hi):
        return jnp.dot(feat, p["w1"][lo:hi],
                       preferred_element_type=jnp.float32)

    proj_d = jnp.stack([_proj(p, drug_feat[i], 0, d)
                        for i, p in enumerate(params)])
    proj_v = jnp.stack([_proj(p, dis_feat[i], d, 2 * d)
                        for i, p in enumerate(params)])
    edges = jnp.stack([src, dst], axis=1)
    out_b = pdb.fused_decoder_batched(
        proj_d, proj_v, stacked["b1"], stacked["w2"], stacked["b2"],
        stacked["w3"][:, :, 0], stacked["b3"], edges, seeds,
        0.3, True, jnp.float32)
    for i, p in enumerate(params):
        out_s = pd.fused_decoder(
            proj_d[i], proj_v[i], p["b1"], p["w2"], p["b2"], p["w3"][:, 0],
            p["b3"], edges[i], seeds[i:i + 1], 0.3, True, jnp.float32)
        np.testing.assert_allclose(np.asarray(out_b[i]), np.asarray(out_s),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=f"fold {i}")


def test_grads_match_xla_per_fold(setup):
    params, stacked, drug_feat, dis_feat, src, dst = setup

    def loss_batched(stacked, df, vf):
        out = pdb.decoder_apply_fused_batched(
            stacked, src, dst, df, vf, dropout_rate=0.0, train=True,
            key=jax.vmap(jax.random.key)(jnp.arange(3, dtype=jnp.uint32)),
            dtype=jnp.float32)
        return jnp.sum(out ** 2)

    g_b = jax.grad(loss_batched, argnums=(0, 1, 2))(stacked, drug_feat,
                                                    dis_feat)
    for i, p in enumerate(params):
        def loss_ref(p, df, vf):
            out = decoder_apply(p, src[i], dst[i], df, vf,
                                dropout_rate=0.0, train=False)
            return jnp.sum(out ** 2)

        g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(p, drug_feat[i],
                                                    dis_feat[i])
        for name in p:
            np.testing.assert_allclose(
                np.asarray(g_b[0][name][i]), np.asarray(g_r[0][name]),
                rtol=1e-4, atol=1e-4, err_msg=f"fold {i} d{name}")
        np.testing.assert_allclose(np.asarray(g_b[1][i]),
                                   np.asarray(g_r[1]), rtol=1e-4,
                                   atol=1e-4, err_msg=f"fold {i} ddrug")
        np.testing.assert_allclose(np.asarray(g_b[2][i]),
                                   np.asarray(g_r[2]), rtol=1e-4,
                                   atol=1e-4, err_msg=f"fold {i} ddis")

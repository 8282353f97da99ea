"""Fused Pallas decoder vs the XLA decoder (CPU interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dream_gnn_tpu.kernels.pallas_decoder as pd
from dream_gnn_tpu.nn.decoder import decoder_apply, decoder_init


@pytest.fixture(autouse=True)
def _interpret():
    old = pd.INTERPRET
    pd.INTERPRET = True
    yield
    pd.INTERPRET = old


@pytest.fixture
def setup(rng):
    nd, nv, d, e = 37, 23, 16, 300
    params = decoder_init(jax.random.key(0), in_units=d)
    drug_feat = jnp.asarray(rng.normal(size=(nd, d)).astype(np.float32))
    dis_feat = jnp.asarray(rng.normal(size=(nv, d)).astype(np.float32))
    src = jnp.asarray(rng.integers(0, nd, e).astype(np.int32))
    dst = jnp.asarray(rng.integers(0, nv, e).astype(np.int32))
    return params, drug_feat, dis_feat, src, dst


def test_eval_matches_xla(setup):
    params, drug_feat, dis_feat, src, dst = setup
    ref = decoder_apply(params, src, dst, drug_feat, dis_feat,
                        dropout_rate=0.0, train=False)
    out = pd.decoder_apply_fused(params, src, dst, drug_feat, dis_feat,
                                 dropout_rate=0.0, train=False,
                                 dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_grads_match_xla(setup):
    params, drug_feat, dis_feat, src, dst = setup

    def loss_ref(params, df, vf):
        out = decoder_apply(params, src, dst, df, vf,
                            dropout_rate=0.0, train=False)
        return jnp.sum(out ** 2)

    def loss_fused(params, df, vf):
        out = pd.decoder_apply_fused(params, src, dst, df, vf,
                                     dropout_rate=0.0, train=True,
                                     key=jax.random.key(3),
                                     dtype=jnp.float32)
        return jnp.sum(out ** 2)

    # train=True but rate=0 -> no dropout; grads must match XLA autodiff.
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(params, drug_feat,
                                                  dis_feat)
    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(params, drug_feat,
                                                      dis_feat)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fused)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-4)


def test_padding_correct(setup):
    """E not a multiple of TILE: padded lanes must not leak."""
    params, drug_feat, dis_feat, src, dst = setup
    out1 = pd.decoder_apply_fused(params, src, dst, drug_feat, dis_feat,
                                  dropout_rate=0.0, train=False,
                                  dtype=jnp.float32)
    out2 = pd.decoder_apply_fused(params, src[:100], dst[:100], drug_feat,
                                  dis_feat, dropout_rate=0.0, train=False,
                                  dtype=jnp.float32)
    assert out1.shape == (300,)
    np.testing.assert_allclose(np.asarray(out1)[:100], np.asarray(out2),
                               rtol=1e-5, atol=1e-6)


def test_dropout_keep_rate(setup):
    """Kernel dropout must keep ~(1-rate) of activations with inverted
    scaling — guards the signed-shift PRNG-bits bug (int32 arithmetic
    shift halves the keep probability).  TPU-only: interpret mode has
    no prng_seed lowering (scripts/check_dropout_tpu.py runs this on
    hardware)."""
    if jax.default_backend() == "cpu":
        pytest.skip("pltpu.prng_seed has no CPU interpret lowering")
    params, drug_feat, dis_feat, src, dst = setup
    rate = 0.3
    outs = []
    for s in range(4):
        out = pd.decoder_apply_fused(params, src, dst, drug_feat, dis_feat,
                                     dropout_rate=rate, train=True,
                                     key=jax.random.key(100 + s),
                                     dtype=jnp.float32)
        outs.append(np.asarray(out))
    ref = np.asarray(pd.decoder_apply_fused(
        params, src, dst, drug_feat, dis_feat, dropout_rate=0.0,
        train=False, dtype=jnp.float32))
    # Inverted dropout is unbiased in expectation at lin3's input; with
    # relu nonlinearity the means won't match exactly, but with the
    # keep-rate bug the output scale collapses (~3.5x too small).
    mean_train = np.mean([np.abs(o).mean() for o in outs])
    mean_ref = np.abs(ref).mean()
    assert 0.4 * mean_ref < mean_train < 2.5 * mean_ref

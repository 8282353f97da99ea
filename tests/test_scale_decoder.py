"""Scale fused decoder vs the XLA per-edge decoder (CPU interpret).

Parity contract: kernels/pallas_scale_decoder.py must reproduce
nn/decoder.decoder_apply (the reference MLPDecoder semantics,
layers.py:341-379) — logits per candidate pair (returned in slot
order; ``layout.inv_slot`` unscrambles) and gradients for every
decoder parameter and both node-feature tables.  Dropout masks are a
murmur-PRF of (seed, edge_id, unit), so they are testable on CPU
(unlike the on-core-PRNG kernels) — including an exactness check that
the backward replays the forward's masks via directional finite
differences.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dream_gnn_tpu.kernels.pallas_scale_decoder as psd
import dream_gnn_tpu.kernels.pallas_spmm_gather as psg
from dream_gnn_tpu.nn.decoder import decoder_apply, decoder_init


@pytest.fixture(autouse=True)
def _interpret():
    import dream_gnn_tpu.kernels.pallas_seq_scatter as psq
    old, oldg, oldq = psd.INTERPRET, psg.INTERPRET, psq.INTERPRET
    psd.INTERPRET = psg.INTERPRET = psq.INTERPRET = True
    yield
    psd.INTERPRET, psg.INTERPRET, psq.INTERPRET = old, oldg, oldq


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def _setup(rng, n_drug=300, n_dis=250, e=2000, d=16):
    params = decoder_init(jax.random.key(0), in_units=d)
    drug_feat = jnp.asarray(rng.normal(size=(n_drug, d)), jnp.float32)
    dis_feat = jnp.asarray(rng.normal(size=(n_dis, d)), jnp.float32)
    src = rng.integers(0, n_drug, e)
    dst = rng.integers(0, n_dis, e)
    layout = psd.build_scale_decoder_layout(src, dst, n_drug, n_dis)
    return params, drug_feat, dis_feat, src, dst, layout


def _phys(got, layout):
    return np.asarray(got)[np.asarray(layout.inv_slot)]


def test_forward_matches_xla(rng):
    params, drug_feat, dis_feat, src, dst, layout = _setup(rng)
    want = decoder_apply(params, jnp.asarray(src), jnp.asarray(dst),
                         drug_feat, dis_feat, dropout_rate=0.0,
                         train=False)
    got = psd.decoder_apply_scale(params, layout, drug_feat, dis_feat,
                                  dropout_rate=0.0, train=False,
                                  dtype=jnp.float32)
    assert got.shape == (layout.n_pos,)
    np.testing.assert_allclose(_phys(got, layout), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_forward_duplicates_and_order(rng):
    """Duplicate candidate pairs and arbitrary order must score
    identically per position (labels match by position — SURVEY
    §7.3.8)."""
    params, drug_feat, dis_feat, _, _, _ = _setup(rng)
    src = np.array([5, 5, 2, 299, 5, 0])
    dst = np.array([7, 7, 0, 249, 7, 1])
    layout = psd.build_scale_decoder_layout(src, dst, 300, 250)
    want = decoder_apply(params, jnp.asarray(src), jnp.asarray(dst),
                         drug_feat, dis_feat, dropout_rate=0.0,
                         train=False)
    got = _phys(psd.decoder_apply_scale(
        params, layout, drug_feat, dis_feat, dropout_rate=0.0,
        train=False, dtype=jnp.float32), layout)
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-4,
                               atol=1e-4)
    assert abs(float(got[0]) - float(got[1])) < 1e-5   # duplicates


def test_grads_match_xla(rng):
    """Full backward parity at rate=0: table grads ride the
    grouped-gather SpMM scatter layouts; weight grads accumulate in
    B1; the dis-side rides the mirror recompute."""
    params, drug_feat, dis_feat, src, dst, layout = _setup(
        rng, n_drug=260, n_dis=180, e=1200)
    tgt = jnp.asarray(rng.normal(size=(len(src),)), jnp.float32)
    tgt_s, w = layout.slot_labels(tgt)

    def loss_xla(params, drug_feat, dis_feat):
        p = decoder_apply(params, jnp.asarray(src), jnp.asarray(dst),
                          drug_feat, dis_feat, dropout_rate=0.0,
                          train=True, key=jax.random.key(3))
        return jnp.mean((p - tgt) ** 2)

    def loss_scale(params, drug_feat, dis_feat):
        p = psd.decoder_apply_scale(params, layout, drug_feat, dis_feat,
                                    dropout_rate=0.0, train=True,
                                    key=jax.random.key(3),
                                    dtype=jnp.float32)
        return jnp.sum(w * (p - tgt_s) ** 2) / jnp.sum(w)

    gw = jax.grad(loss_xla, argnums=(0, 1, 2))(params, drug_feat,
                                               dis_feat)
    gs = jax.grad(loss_scale, argnums=(0, 1, 2))(params, drug_feat,
                                                 dis_feat)
    flat_w, _ = jax.tree_util.tree_flatten_with_path(gw)
    flat_s, _ = jax.tree_util.tree_flatten_with_path(gs)
    for (pw, wv), (ps_, s) in zip(flat_w, flat_s):
        assert pw == ps_
        np.testing.assert_allclose(
            np.asarray(s), np.asarray(wv), rtol=2e-3, atol=2e-5,
            err_msg=str(pw))


def test_dropout_deterministic_and_masked(rng):
    """Same seed => identical logits; each logit is either the
    no-dropout value scaled consistently or differs (masks actually
    fire)."""
    params, drug_feat, dis_feat, src, dst, layout = _setup(rng, e=800)
    kw = dict(dropout_rate=0.4, train=True, key=jax.random.key(9),
              dtype=jnp.float32)
    a = psd.decoder_apply_scale(params, layout, drug_feat, dis_feat,
                                **kw)
    b = psd.decoder_apply_scale(params, layout, drug_feat, dis_feat,
                                **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    nodrop = psd.decoder_apply_scale(
        params, layout, drug_feat, dis_feat, dropout_rate=0.0,
        train=True, key=jax.random.key(9), dtype=jnp.float32)
    w = np.asarray(layout.fwd.val).reshape(-1) > 0
    diff = np.abs(np.asarray(a) - np.asarray(nodrop))[w]
    assert (diff > 1e-6).mean() > 0.5     # dropout fired


def test_dropout_grads_finite_difference(rng):
    """The backward (B1 + mirror recompute) must replay the forward's
    PRF masks EXACTLY — checked by directional finite differences on
    both projection tables with dropout active (a mask mismatch
    anywhere shows up as a wrong directional derivative)."""
    params, drug_feat, dis_feat, src, dst, layout = _setup(
        rng, n_drug=120, n_dis=90, e=500)
    tgt = jnp.asarray(rng.normal(size=(len(src),)), jnp.float32)
    tgt_s, w = layout.slot_labels(tgt)

    def loss(drug_feat, dis_feat):
        p = psd.decoder_apply_scale(params, layout, drug_feat, dis_feat,
                                    dropout_rate=0.5, train=True,
                                    key=jax.random.key(11),
                                    dtype=jnp.float32)
        return jnp.sum(w * (p - tgt_s) ** 2) / jnp.sum(w)

    g_drug, g_dis = jax.grad(loss, argnums=(0, 1))(drug_feat, dis_feat)
    eps = 1e-3
    for feat_i, g in ((0, g_drug), (1, g_dis)):
        v = rng.normal(size=g.shape).astype(np.float32)
        args_p = [drug_feat, dis_feat]
        args_m = [drug_feat, dis_feat]
        args_p[feat_i] = args_p[feat_i] + eps * v
        args_m[feat_i] = args_m[feat_i] - eps * v
        fd = (float(loss(*args_p)) - float(loss(*args_m))) / (2 * eps)
        an = float(jnp.sum(g * v))
        np.testing.assert_allclose(fd, an, rtol=2e-2, atol=1e-4)


def test_eval_mode_no_a1(rng):
    """Eval forward must not allocate the full a1 table (its shape is
    one block)."""
    params, drug_feat, dis_feat, src, dst, layout = _setup(rng, e=600)
    out = psd.decoder_apply_scale(params, layout, drug_feat, dis_feat,
                                  dropout_rate=0.3, train=False,
                                  dtype=jnp.float32)
    assert out.shape == (layout.n_pos,)
    assert np.isfinite(_phys(out, layout)).all()


def test_layout_invariants(rng):
    _, _, _, src, dst, layout = _setup(rng, e=3000)
    eid = np.asarray(layout.fwd.edge_id).reshape(-1)
    live = eid < 3000
    assert np.sort(eid[live]).tolist() == list(range(3000))
    inv = np.asarray(layout.inv_slot)
    assert (eid[inv] == np.arange(3000)).all()
    # dis_of_slot matches each live slot's candidate.
    assert (np.asarray(layout.dis_of_slot)[live]
            == dst[eid[live]]).all()
    # gout_perm routes each live mirror slot to its fwd slot.
    eidm = np.asarray(layout.mirror.edge_id).reshape(-1)
    livem = eidm < 3000
    gp = np.asarray(layout.gout_perm)
    assert (gp[~livem] == layout.n_pos).all()
    assert (eid[gp[livem]] == eidm[livem]).all()
    # slot_labels permutes labels with matching weights.
    labels = np.arange(3000, dtype=np.float32)
    lab_s, w = layout.slot_labels(jnp.asarray(labels))
    assert (np.asarray(w) == live.astype(np.float32)).all()
    assert (np.asarray(lab_s)[live] == labels[eid[live]]).all()

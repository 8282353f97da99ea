"""Attribute the scale decoder's IN-STEP cost vs its bare kernel cost.

ablate_scale_step (round 4) measures the 1M-candidate fused decoder at
~22 ms inside the training step (full - 8k-candidate step), while the
bare custom-VJP chain times 10.9 ms — this probe builds intermediate
composites to locate the ~11 ms difference:

  bare      grad through scale_decoder alone (proj tables as inputs)
  +proj     + the two (100k,128)@(128,128) projection matmuls and
              their backward (w1/feature-table cotangents), i.e.
              decoder_apply_scale end-to-end
  +loss     + the slot-weighted BCE reduction (the step's loss form)

Everything is an amortised chained dispatch (utils/timing.chained_ms).
"""

import _bootstrap  # noqa: F401

_bootstrap.setup_jax_cache()

import jax
import jax.numpy as jnp
import numpy as np

from dream_gnn_tpu.kernels.pallas_scale_decoder import (
    build_scale_decoder_layout, decoder_apply_scale, scale_decoder)
from dream_gnn_tpu.nn.decoder import decoder_init
from dream_gnn_tpu.train.losses import bce_with_logits
from dream_gnn_tpu.utils.timing import chained_ms

N, E, D, RATE = 100_000, 1_000_000, 128, 0.3

rng = np.random.default_rng(0)
print("building 1M-candidate layout...", flush=True)
layout = build_scale_decoder_layout(
    rng.integers(0, N, E).astype(np.int32),
    rng.integers(0, N, E).astype(np.int32), N, N)
labels, weights = layout.slot_labels(jnp.asarray(
    (rng.random(E) < 0.3).astype(np.float32)))
params = decoder_init(jax.random.key(5), in_units=D)
pd = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
pv = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
feats_d = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
feats_v = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
seed = jnp.asarray([123], jnp.int32)
key = jax.random.key(9)


def bare(pd_, lay, pv_):
    def loss(q, pv2, b1, w2, b2, w3, b3):
        p = scale_decoder(RATE, True, jnp.bfloat16, lay, q, pv2, b1,
                          w2, b2, w3, b3, seed)
        return jnp.sum(p ** 2)
    g = jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5, 6))(
        pd_, pv_, params["b1"], params["w2"], params["b2"],
        params["w3"][:, 0], params["b3"])
    return g[0]


def with_proj(fd, lay, fv):
    def loss(fd_, fv_, prm):
        p = decoder_apply_scale(prm, lay, fd_, fv_, dropout_rate=RATE,
                                train=True, key=key)
        return jnp.sum(p ** 2)
    g = jax.grad(loss, argnums=(0, 1, 2))(fd, fv, params)
    return g[0]


def with_loss(fd, lay, fv):
    def loss(fd_, fv_, prm):
        p = decoder_apply_scale(prm, lay, fd_, fv_, dropout_rate=RATE,
                                train=True, key=key)
        return bce_with_logits(p, labels, weight=weights)
    g = jax.grad(loss, argnums=(0, 1, 2))(fd, fv, params)
    return g[0]


for name, fn, x0, other in (
        ("bare kernel fwd+bwd", bare, pd, pv),
        ("+ proj matmuls (decoder_apply_scale)", with_proj, feats_d,
         feats_v),
        ("+ slot-weighted BCE loss", with_loss, feats_d, feats_v)):
    ms = chained_ms(fn, x0, args=(layout, other), n=6, reps=2,
                    name=name)
    print(f"{name:42s} {ms:7.2f} ms", flush=True)

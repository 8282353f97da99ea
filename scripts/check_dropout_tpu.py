"""TPU check: fused-decoder dropout keep-rate statistics.

Guards the signed-shift PRNG-bits bug (kernels/pallas_decoder.py
_dropout_mask): with the bug, train-mode output magnitudes collapse
~3.5x below eval-mode; fixed, inverted dropout keeps them comparable.
"""

import _bootstrap  # noqa: F401  (repo root on sys.path)

_bootstrap.setup_jax_cache()

import jax
import jax.numpy as jnp
import numpy as np

import dream_gnn_tpu.kernels.pallas_decoder as pd
from dream_gnn_tpu.nn.decoder import decoder_apply, decoder_init

rng = np.random.default_rng(0)
nd, nv, d, e = 200, 150, 64, 20000
params = decoder_init(jax.random.key(0), in_units=d)
drug_feat = jnp.asarray(rng.normal(size=(nd, d)).astype(np.float32))
dis_feat = jnp.asarray(rng.normal(size=(nv, d)).astype(np.float32))
src = jnp.asarray(rng.integers(0, nd, e).astype(np.int32))
dst = jnp.asarray(rng.integers(0, nv, e).astype(np.int32))

ref = np.asarray(pd.decoder_apply_fused(
    params, src, dst, drug_feat, dis_feat, dropout_rate=0.0, train=False,
    dtype=jnp.float32))
rate = 0.3
outs = [np.abs(np.asarray(pd.decoder_apply_fused(
    params, src, dst, drug_feat, dis_feat, dropout_rate=rate, train=True,
    key=jax.random.key(100 + s), dtype=jnp.float32))).mean()
    for s in range(4)]
mean_train = float(np.mean(outs))
mean_ref = float(np.abs(ref).mean())
print(f"train |out| mean {mean_train:.4f} vs eval {mean_ref:.4f} "
      f"(ratio {mean_train / mean_ref:.2f})")
assert 0.4 * mean_ref < mean_train < 2.5 * mean_ref, "dropout stats broken"

# Also compare against the XLA path's train-mode statistics.
xla = [np.abs(np.asarray(decoder_apply(
    params, src, dst, drug_feat, dis_feat, dropout_rate=rate, train=True,
    key=jax.random.key(200 + s), dtype=jnp.float32))).mean()
    for s in range(4)]
print(f"xla train |out| mean {float(np.mean(xla)):.4f}")
assert abs(mean_train - float(np.mean(xla))) < 0.35 * mean_ref
print("dropout keep-rate OK")

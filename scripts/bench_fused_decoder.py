"""Fused Pallas decoder on the TPU: numerics + speed vs XLA path."""

import _bootstrap  # noqa: F401  (repo root on sys.path)

_bootstrap.setup_jax_cache()

import time

import jax
import jax.numpy as jnp
import numpy as np

import dream_gnn_tpu.kernels.pallas_decoder as pd
from dream_gnn_tpu.nn.decoder import decoder_apply, decoder_init

rng = np.random.default_rng(0)
nd, nv, d, e = 763, 681, 128, 467_000
params = decoder_init(jax.random.key(0), in_units=d)
drug_feat = jnp.asarray(rng.normal(size=(nd, d)).astype(np.float32))
dis_feat = jnp.asarray(rng.normal(size=(nv, d)).astype(np.float32))
src = jnp.asarray(rng.integers(0, nd, e).astype(np.int32))
dst = jnp.asarray(rng.integers(0, nv, e).astype(np.int32))

# numerics (eval mode, fp32)
ref = jax.jit(lambda p: decoder_apply(p, src, dst, drug_feat, dis_feat,
                                      dropout_rate=0.0, train=False))(params)
fused = jax.jit(lambda p: pd.decoder_apply_fused(
    p, src, dst, drug_feat, dis_feat, dropout_rate=0.0, train=False,
    dtype=jnp.float32))(params)
err = float(jnp.max(jnp.abs(ref - fused)))
print(f"max |ref - fused| (fp32 eval): {err:.2e}")

# grad numerics
def loss_ref(p):
    out = decoder_apply(p, src, dst, drug_feat, dis_feat,
                        dropout_rate=0.0, train=False)
    return jnp.mean(out ** 2)

def loss_fused(p):
    out = pd.decoder_apply_fused(p, src, dst, drug_feat, dis_feat,
                                 dropout_rate=0.0, train=True,
                                 key=jax.random.key(1), dtype=jnp.float32)
    return jnp.mean(out ** 2)

g1 = jax.jit(jax.grad(loss_ref))(params)
g2 = jax.jit(jax.grad(loss_fused))(params)
for k in g1:
    e_ = float(jnp.max(jnp.abs(g1[k] - g2[k])) /
               (1e-8 + float(jnp.max(jnp.abs(g1[k])))))
    print(f"grad rel err {k}: {e_:.2e}")


def timed(name, fn, arg, steps=30):
    # vary arg per call (scan) to defeat relay caching
    def body(c, _):
        out = fn(c)
        return c + 1e-6, out if out.ndim else out

    run = jax.jit(lambda a: jax.lax.scan(
        lambda c, _: (c * 1.000001, jnp.sum(fn(c))), a, length=steps))
    c, outs = run(arg)
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    c, outs = run(arg)
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / steps * 1e3
    print(f"{name:40s} {dt:7.3f} ms")


# fwd speed (train mode with dropout)
def xla_fwd(scale):
    return decoder_apply(params, src, dst, drug_feat * scale, dis_feat,
                         dropout_rate=0.3, train=True,
                         key=jax.random.key(2))

def fused_fwd(scale):
    return pd.decoder_apply_fused(params, src, dst, drug_feat * scale,
                                  dis_feat, dropout_rate=0.3, train=True,
                                  key=jax.random.key(2),
                                  dtype=jnp.bfloat16)

timed("XLA decoder fwd (train)", lambda s: xla_fwd(s), jnp.float32(1.0))
timed("fused decoder fwd (train)", lambda s: fused_fwd(s), jnp.float32(1.0))

def xla_step(scale):
    return jax.grad(lambda s: jnp.sum(xla_fwd(s) ** 2))(scale)

def fused_step(scale):
    return jax.grad(lambda s: jnp.sum(fused_fwd(s) ** 2))(scale)

timed("XLA decoder fwd+bwd", lambda s: jnp.asarray(xla_step(s)),
      jnp.float32(1.0))
timed("fused decoder fwd+bwd", lambda s: jnp.asarray(fused_step(s)),
      jnp.float32(1.0))

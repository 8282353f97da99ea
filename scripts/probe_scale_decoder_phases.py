"""Phase split of the scale decoder's fwd+bwd (VERDICT r4 #4b).

The fused scale decoder measures ~11 ms fwd+bwd at 1M candidates
against a 3.27 ms HBM floor; round 4 shipped the kernel with no
per-phase attribution.  This probe times every constituent of
``scale_decoder``'s custom VJP separately (amortised chained
dispatch, distinct buffers):

    fwd:  buf      XLA gather  P_dis[dis_of_slot]      (1M x 128 rows)
          K2       stream kernel (panel DMA + sub-vreg gathers +
                   batched MXU transposes + fused MLP + a1 spill)
    bwd:  B1       recompute-MLP kernel, da1 edge-major
          scatD    grouped SpMM  da1 -> d_P_drug
          permM    gout slot->mirror permute + P_drug[drug_of_mslot]
          mirror   dis-sorted recompute kernel -> da1_m
          scatV    grouped SpMM  da1_m -> d_P_dis

and compares their sum against the measured end-to-end fwd+bwd chain
(the phases share no buffers, so a large overlap shortfall means XLA
serialises them — same analysis as the SpMM probe, docs §4).
"""

import _bootstrap  # noqa: F401

_bootstrap.setup_jax_cache()

import faulthandler
import signal

faulthandler.dump_traceback_later(900, repeat=True)
signal.alarm(3300)

import time

import jax
import jax.numpy as jnp
import numpy as np

from dream_gnn_tpu.kernels.pallas_scale_decoder import (
    _b1_call, _k2_call, _mirror_call, build_scale_decoder_layout,
    scale_decoder)
from dream_gnn_tpu.kernels.pallas_spmm_gather import _spmm_gather_raw
from dream_gnn_tpu.nn.decoder import decoder_init
from dream_gnn_tpu.utils.timing import chained_ms

n_nodes, n_cand, d = 100_000, 1_000_000, 128
rng = np.random.default_rng(42)
print("building decoder layout...", flush=True)
t0 = time.perf_counter()
lay = build_scale_decoder_layout(
    rng.integers(0, n_nodes, n_cand).astype(np.int32),
    rng.integers(0, n_nodes, n_cand).astype(np.int32), n_nodes, n_nodes)
print(f"  {time.perf_counter() - t0:.1f}s", flush=True)

par = decoder_init(jax.random.key(5), in_units=d)
pd = jnp.asarray(rng.normal(size=(n_nodes, d)).astype(np.float32))
pv = jnp.asarray(rng.normal(size=(n_nodes, d)).astype(np.float32))
seed = jnp.asarray([123], jnp.int32)
w3v, b3v = par["w3"][:, 0], par["b3"]
labels, weights = lay.slot_labels(
    jnp.asarray((rng.random(n_cand) < 0.3).astype(np.float32)))
rate, train, dtype = 0.3, True, jnp.bfloat16

# Reference end-to-end fwd+bwd (same contraction bench.py times).


def dec_fb(pd_, lay, pv_):
    def loss(q, pv2, b1_, w2_, b2_, w3_, b3_):
        p = scale_decoder(rate, train, dtype, lay, q, pv2, b1_, w2_,
                          b2_, w3_, b3_, seed)
        return jnp.sum(weights * (p - labels) ** 2)
    return jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5, 6))(
        pd_, pv_, par["b1"], par["w2"], par["b2"], w3v, b3v)[0]


e2e = chained_ms(dec_fb, pd, args=(lay, pv), n=6, reps=3,
                 floor_ms=None, name="e2e fwd+bwd")
print(f"e2e fwd+bwd      {e2e:7.2f} ms", flush=True)

# Materialised intermediates for the isolated phases.
bufd = jnp.bfloat16
buf = pv.astype(bufd)[lay.dis_of_slot]
logits, a1 = jax.jit(lambda pd_, buf_: _k2_call(
    lay, pd_, buf_, par["b1"], par["w2"], par["b2"], w3v, seed, rate,
    train, dtype))(pd, buf)
gout = jnp.asarray(rng.normal(size=(lay.n_pos,)).astype(np.float32))
da1, *_ = jax.jit(lambda a1_, g_: _b1_call(
    lay, a1_, g_, par["w2"], par["b2"], w3v, seed, rate, train,
    dtype))(a1, gout)
buf_pd = pd.astype(da1.dtype)[lay.drug_of_mslot]
gout_m = jnp.concatenate([gout, jnp.zeros((1,), jnp.float32)])[
    lay.gout_perm]
da1_m = jax.jit(lambda pv_, bpd, gm: _mirror_call(
    lay, pv_, bpd, gm, par["b1"], par["w2"], par["b2"], w3v, seed,
    rate, train, dtype))(pv, buf_pd, gout_m)

phases = [
    ("buf gather", lambda x, l: x.astype(bufd)[l.dis_of_slot], pv),
    ("K2 fwd", lambda x, l: _k2_call(
        l, x, buf, par["b1"], par["w2"], par["b2"], w3v, seed, rate,
        train, dtype)[0], pd),
    ("B1", lambda x, l: _b1_call(
        l, a1, x.reshape(-1)[: l.n_pos] * 0 + gout, par["w2"],
        par["b2"], w3v, seed, rate, train, dtype)[0], gout),
    ("scatD spmm", lambda x, l: _spmm_gather_raw(
        l.scat_drug, x, dtype=dtype), da1),
    ("permM+gath", lambda x, l: (
        x.astype(da1.dtype)[l.drug_of_mslot],
        jnp.concatenate([gout, jnp.zeros((1,), jnp.float32)])[
            l.gout_perm]), pd),
    ("mirror", lambda x, l: _mirror_call(
        l, x, buf_pd, gout_m, par["b1"], par["w2"], par["b2"], w3v,
        seed, rate, train, dtype), pv),
    ("scatV spmm", lambda x, l: _spmm_gather_raw(
        l.scat_dis, x, dtype=dtype), da1_m),
]

total = 0.0
for name, fn, x0 in phases:
    def wrapped(x, l, fn=fn):
        out = fn(x, l)
        return out[0] if isinstance(out, tuple) else out
    ms = chained_ms(wrapped, x0, args=(lay,), n=8, reps=3,
                    floor_ms=None, name=name)
    total += ms
    print(f"{name:12s} {ms:7.2f} ms", flush=True)
print(f"{'sum':12s} {total:7.2f} ms  (e2e {e2e:.2f}; overlap "
      f"{total - e2e:.2f})", flush=True)

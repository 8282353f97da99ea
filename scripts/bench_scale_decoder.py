"""Bench the scale fused decoder vs the XLA fallback on the real chip
(VERDICT r3 #2: the 1M-candidate XLA decoder cost ~39 ms of the 352 ms
scale step).

Measures, at the scale config (100k x 100k nodes, 1M candidates,
H1=128):
  - decoder fwd (train mode: includes the a1 spill)
  - decoder fwd+bwd (grad wrt both projection tables + all MLP params)
for the Pallas scale kernel and the XLA decoder_apply fallback, all
via utils/timing.chained_ms with HBM/MXU floor guards.

Run: python scripts/bench_scale_decoder.py [--quick]
"""

import _bootstrap  # noqa: F401

_bootstrap.setup_jax_cache()

import faulthandler
import signal
import sys
import time

faulthandler.dump_traceback_later(900, repeat=True)
signal.alarm(2400)

import jax
import jax.numpy as jnp
import numpy as np

from dream_gnn_tpu.kernels.pallas_scale_decoder import (
    build_scale_decoder_layout, scale_decoder)
from dream_gnn_tpu.utils.timing import (chained_ms,
                                        scale_decoder_floor_ms,
                                        spmm_gather_floor_ms)

QUICK = "--quick" in sys.argv
N = 100_000
E = 1_000_000
H1, H2 = 128, 64
RATE = 0.3


def main():
    rng = np.random.default_rng(3)
    dec_src = rng.integers(0, N, E)
    dec_dst = rng.integers(0, N, E)
    t0 = time.perf_counter()
    layout = build_scale_decoder_layout(dec_src, dec_dst, N, N)
    occ = layout.fwd.occupancy
    print(f"layout: {time.perf_counter() - t0:.1f}s build, "
          f"chunks={layout.fwd.n_chunks} span={layout.fwd.span} "
          f"window={layout.fwd.window} occ={occ:.2f} "
          f"n_pos={layout.n_pos} mirror occ="
          f"{layout.mirror.occupancy:.2f} "
          f"scat_drug occ={layout.scat_drug.occupancy:.2f} "
          f"scat_dis occ={layout.scat_dis.occupancy:.2f}", flush=True)

    pd = jnp.asarray(rng.normal(size=(N, H1)).astype(np.float32))
    pv = jnp.asarray(rng.normal(size=(N, H1)).astype(np.float32))
    b1 = jnp.zeros((H1,), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(H1, H2)).astype(np.float32) * 0.1)
    b2 = jnp.zeros((H2,), jnp.float32)
    w3 = jnp.asarray(rng.normal(size=(H2,)).astype(np.float32) * 0.1)
    b3 = jnp.zeros((1,), jnp.float32)
    seed = jnp.asarray([1234], jnp.int32)
    tgt = jnp.asarray(rng.normal(size=(E,)).astype(np.float32))
    tgt_s, w_s = layout.slot_labels(tgt)
    wsum = jnp.sum(w_s)
    reps = 2 if QUICK else 3

    floor_f = scale_decoder_floor_ms(layout, H1, train=True)

    def fwd(x, lay, pv):
        return scale_decoder(RATE, True, jnp.bfloat16, lay, x, pv, b1,
                             w2, b2, w3, b3, seed)

    ms = chained_ms(fwd, pd, args=(layout, pv), n=8, reps=reps,
                    floor_ms=floor_f, name="scale-dec fwd")
    print(f"pallas fwd       {ms:8.2f} ms (floor {floor_f:.2f})",
          flush=True)

    floor_fb = (floor_f
                + 2 * H1 * layout.n_pos * 2 / 819e9 * 1e3   # a1+da1
                + spmm_gather_floor_ms(layout.scat_drug, H1, packed=True)
                + spmm_gather_floor_ms(layout.scat_dis, H1, packed=True))

    def fb(x, lay, pv):
        def loss(pd_, pv_, b1_, w2_, b2_, w3_, b3_):
            p = scale_decoder(RATE, True, jnp.bfloat16, lay, pd_, pv_,
                              b1_, w2_, b2_, w3_, b3_, seed)
            return jnp.sum(w_s * (p - tgt_s) ** 2) / wsum
        g = jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5, 6))(
            x, pv, b1, w2, b2, w3, b3)
        return g[0]

    ms_fb = chained_ms(fb, pd, args=(layout, pv), n=6, reps=reps,
                       floor_ms=floor_fb, name="scale-dec fwd+bwd")
    print(f"pallas fwd+bwd   {ms_fb:8.2f} ms (floor {floor_fb:.2f})",
          flush=True)

    # XLA fallback (what the scale step used through round 3).
    src_j = jnp.asarray(dec_src.astype(np.int32))
    dst_j = jnp.asarray(dec_dst.astype(np.int32))

    def xla_fwd(x, pv, k):
        h = jax.nn.relu(x[src_j] + pv[dst_j] + b1)
        k1, k2 = jax.random.split(k)
        h = h * (jax.random.bernoulli(k1, 1 - RATE, h.shape)
                 / (1 - RATE))
        h = jax.nn.relu(jnp.dot(h.astype(jnp.bfloat16),
                                w2.astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32) + b2)
        h = h * (jax.random.bernoulli(k2, 1 - RATE, h.shape)
                 / (1 - RATE))
        return jnp.dot(h.astype(jnp.bfloat16), w3.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32) + b3[0]

    key = jax.random.key(0)
    ms_x = chained_ms(xla_fwd, pd, args=(pv, key), n=6, reps=reps,
                      name="xla fwd")
    print(f"xla fwd          {ms_x:8.2f} ms", flush=True)

    def xla_fb(x, pv, k):
        def loss(pd_, pv_):
            return jnp.mean((xla_fwd(pd_, pv_, k) - tgt) ** 2)
        return jax.grad(loss)(x, pv)

    ms_xfb = chained_ms(xla_fb, pd, args=(pv, key), n=4, reps=reps,
                        name="xla fwd+bwd")
    print(f"xla fwd+bwd      {ms_xfb:8.2f} ms", flush=True)
    print(f"\nspeedup: fwd {ms_x / ms:.2f}x, fwd+bwd "
          f"{ms_xfb / ms_fb:.2f}x", flush=True)


if __name__ == "__main__":
    main()

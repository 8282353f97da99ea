"""The round-4 headline account's last untried lever (VERDICT r4 #6):
"fewer, larger tile visits (VMEM-capped)" for the grid decoder.

Round 4 measured ROWS=48/64 failing to compile (backward VMEM
intermediates overflow).  The untried variant: shrink the
intermediates so bigger tiles fit — cast the dropout-scaled
activations (h1d/h2d) and masks to bf16 inside the tile recompute
(they feed bf16 matmuls anyway; a1/a2 stay f32 for the relu
compares).  This probe times fused_grid_decoder fwd+bwd at the lrssl
protocol shape for (ROWS, bf16-intermediates) in
{(32, no), (32, yes), (64, yes), (64, no)} and reports compile
failures as the measured negative.
"""

import _bootstrap  # noqa: F401

_bootstrap.setup_jax_cache()

import faulthandler
import signal

faulthandler.dump_traceback_later(600, repeat=True)
signal.alarm(2400)

import jax
import jax.numpy as jnp
import numpy as np

import dream_gnn_tpu.kernels.pallas_grid_decoder as pgd
from dream_gnn_tpu.utils.timing import chained_ms

nd, nv, h1, h2 = 763, 681, 128, 128
rng = np.random.default_rng(0)
prd = jnp.asarray(rng.normal(size=(nd, h1)).astype(np.float32))
prv = jnp.asarray(rng.normal(size=(nv, h1)).astype(np.float32))
b1 = jnp.asarray(rng.normal(size=(h1,)).astype(np.float32))
w2 = jnp.asarray(rng.normal(size=(h1, h2)).astype(np.float32) * 0.1)
b2 = jnp.asarray(rng.normal(size=(h2,)).astype(np.float32))
w3 = jnp.asarray(rng.normal(size=(h2,)).astype(np.float32) * 0.1)
seed = jnp.asarray([7], jnp.int32)


def fb(prd_, prv_):
    def loss(a, b):
        out = pgd.fused_grid_decoder(a, b, b1, w2, b2, w3, seed,
                                     0.3, True, jnp.bfloat16)
        return jnp.sum(out ** 2)
    return jax.grad(loss, argnums=(0, 1))(prd_, prv_)[0]


for rows, half in ((32, False), (32, True), (64, True), (64, False)):
    pgd._ROWS = rows
    pgd._HALF_INTERMEDIATES = half
    try:
        ms = chained_ms(fb, prd, args=(prv,), n=8, reps=3,
                        floor_ms=None, name=f"rows{rows}")
        print(f"ROWS={rows} bf16={half}: {ms:7.2f} ms fwd+bwd",
              flush=True)
    except Exception as e:
        print(f"ROWS={rows} bf16={half}: FAILED "
              f"{type(e).__name__}: {str(e)[:220]}", flush=True)
pgd._ROWS = 32
pgd._HALF_INTERMEDIATES = False

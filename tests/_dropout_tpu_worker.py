"""Real-TPU worker: fused-decoder dropout statistics.

Runs on the image's default backend (the axon TPU plugin); prints one
machine-checkable line per kernel.  The round-1 decoder-dropout-rate
bug (signed-shift PRNG bits, BASELINE.md root-cause) lived exactly in
this path and was invisible to the CPU suite — the kernels' on-core
PRNG (pltpu.prng_seed) has no interpret lowering.

Method: weights are constructed so each scored edge/cell's output is
an exact count of kept hidden units divided by the keep rate:
  w1=0, b1=1  -> h1 = 1 (every unit)
  cfg "m2":  w2=0, b2=1, w3=1 -> out*keep   = #kept units of mask2
  cfg "m12": w2=I, b2=0, w3=1 -> out*keep^2 = #units kept by BOTH masks
The counts are Binomial(H, keep) / Binomial(H, keep^2) iff the mask
rate is correct and units are independent; the empirical mean pins the
rate, the variance pins per-unit independence (a shared-bit bug
inflates it by ~H), and a lagged correlation pins per-edge/tile
independence.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp
import numpy as np

RATE = 0.3
KEEP = 1.0 - RATE
H = 64          # hidden1 == hidden2 so w2 can be the identity
D = 16


def _params(cfg: str):
    eye = jnp.eye(H, dtype=jnp.float32)
    return {
        "w1": jnp.zeros((2 * D, H), jnp.float32),
        "b1": jnp.ones((H,), jnp.float32),
        "w2": jnp.zeros((H, H), jnp.float32) if cfg == "m2" else eye,
        "b2": (jnp.ones if cfg == "m2" else jnp.zeros)((H,), jnp.float32),
        "w3": jnp.ones((H, 1), jnp.float32),
        "b3": jnp.zeros((1,), jnp.float32),
    }


def _check(name: str, counts: np.ndarray, n_units: int, p: float):
    counts = counts.reshape(-1)
    frac = counts.mean() / n_units
    assert abs(frac - p) < 0.02, f"{name}: keep-rate {frac:.4f} != {p}"
    # Integer counts: the output really is (#kept)/keep^k.
    dev = np.abs(counts - np.round(counts)).max()
    assert dev < 0.05, f"{name}: counts not integral (max dev {dev:.3f})"
    var_ratio = counts.var() / (n_units * p * (1 - p))
    assert 0.7 < var_ratio < 1.4, \
        f"{name}: variance ratio {var_ratio:.2f} — units not independent"
    a, b = counts[:-1] - counts.mean(), counts[1:] - counts.mean()
    corr = float((a * b).mean() / (counts.var() + 1e-9))
    assert abs(corr) < 0.1, f"{name}: edge-to-edge corr {corr:.3f}"
    print(f"DROPOUT_OK {name} keep={frac:.4f} var_ratio={var_ratio:.2f} "
          f"corr={corr:.3f}", flush=True)


def main() -> None:
    if jax.devices()[0].platform != "tpu":
        print(f"DROPOUT_SKIP platform={jax.devices()[0].platform}",
              flush=True)
        return

    import dream_gnn_tpu.kernels.pallas_decoder as pd
    from dream_gnn_tpu.kernels.pallas_decoder_batched import (
        decoder_apply_fused_batched)
    from dream_gnn_tpu.kernels.pallas_grid_decoder import (
        decoder_apply_grid_fused)

    rng = np.random.default_rng(0)
    nd, nv, e = 200, 150, 8192
    drug_feat = jnp.zeros((nd, D), jnp.float32)
    dis_feat = jnp.zeros((nv, D), jnp.float32)
    src = jnp.asarray(rng.integers(0, nd, e).astype(np.int32))
    dst = jnp.asarray(rng.integers(0, nv, e).astype(np.int32))

    for cfg, scale, p in (("m2", KEEP, KEEP), ("m12", KEEP**2, KEEP**2)):
        out = np.asarray(pd.decoder_apply_fused(
            _params(cfg), src, dst, drug_feat, dis_feat,
            dropout_rate=RATE, train=True, key=jax.random.key(1),
            dtype=jnp.float32))
        _check(f"pallas_decoder/{cfg}", out * scale, H, p)

    # Fold-batched kernel: per-fold seeds must give distinct streams.
    f = 4
    stack = lambda x: jnp.broadcast_to(x, (f,) + x.shape)     # noqa: E731
    bparams = jax.tree.map(stack, _params("m2"))
    bout = np.asarray(decoder_apply_fused_batched(
        bparams, stack(src), stack(dst), stack(drug_feat),
        stack(dis_feat), dropout_rate=RATE, train=True,
        key=jax.random.split(jax.random.key(2), f), dtype=jnp.float32))
    _check("pallas_decoder_batched/m2", bout * KEEP, H, KEEP)
    k0, k1 = bout[0] - bout[0].mean(), bout[1] - bout[1].mean()
    fold_corr = float((k0 * k1).mean() / (bout[0].var() + 1e-9))
    assert abs(fold_corr) < 0.1, f"fold streams correlate: {fold_corr:.3f}"
    print(f"DROPOUT_OK pallas_decoder_batched/folds corr={fold_corr:.3f}",
          flush=True)

    gout = np.asarray(decoder_apply_grid_fused(
        _params("m2"), jnp.zeros((64, D), jnp.float32),
        jnp.zeros((256, D), jnp.float32), dropout_rate=RATE, train=True,
        key=jax.random.key(3), dtype=jnp.float32))
    _check("pallas_grid_decoder/m2", gout * KEEP, H, KEEP)

    from dream_gnn_tpu.kernels.pallas_grid_decoder import (
        decoder_apply_grid_fused_batched)

    gbout = np.asarray(decoder_apply_grid_fused_batched(
        bparams, stack(jnp.zeros((64, D), jnp.float32)),
        stack(jnp.zeros((256, D), jnp.float32)), dropout_rate=RATE,
        train=True, key=jax.random.split(jax.random.key(4), f),
        dtype=jnp.float32))
    _check("pallas_grid_decoder_batched/m2", gbout * KEEP, H, KEEP)

    print("DROPOUT_ALL_OK", flush=True)


if __name__ == "__main__":
    main()

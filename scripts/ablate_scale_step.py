"""Attribution of the 10M-edge full training step (VERDICT r2 #3).

Decomposes the scale config's step time (BENCH `full_step_ms_10m`) by
toggling components: GCMC layer count (the 12 gather-SpMM
applications), the 1M-candidate decoder, and backward+Adam
(forward-only eval step).  Every timing is a lax.scan N-step chain
with loss readback, per-step = (T_N - T_1)/(N - 1) — the repo's
relay-safe methodology (utils/timing.py rationale).  Prints a
component table plus the achieved fraction of the bare-kernel
prediction, giving the whole-step bandwidth/MFU accountability the
kernel-level roofline (bench_spmm_gather_variants.py) doesn't cover.
"""

import _bootstrap  # noqa: F401  (repo root on sys.path)

_bootstrap.setup_jax_cache()

import dataclasses
import faulthandler
import signal
import time

faulthandler.dump_traceback_later(900, repeat=True)
signal.alarm(2400)

import jax
import jax.numpy as jnp
import numpy as np

from dream_gnn_tpu.config import AugmentConfig, ModelConfig, TrainConfig
from dream_gnn_tpu.graph.coo import coo_from_arrays
from dream_gnn_tpu.graph.grouped import build_enc_graph_grouped
from dream_gnn_tpu.model.dream_gnn import ModelInputs, init_params
from dream_gnn_tpu.train.step import make_train_fns

n_nodes = 100_000
n_edges = 10_000_000
d = 128
rng = np.random.default_rng(0)
src = rng.integers(0, n_nodes, n_edges)
dst = rng.integers(0, n_nodes, n_edges)
vals01 = (rng.random(n_edges) < 0.3).astype(np.float32)
x = jnp.asarray(rng.normal(size=(n_nodes, d)).astype(np.float32))

print("building grouped enc graph (8 layouts)...", flush=True)
t0 = time.perf_counter()
graph = build_enc_graph_grouped(np.stack([src, dst]), vals01,
                                n_nodes, n_nodes)
print(f"  build {time.perf_counter() - t0:.1f}s", flush=True)
eye = coo_from_arrays(np.arange(n_nodes), np.arange(n_nodes),
                      np.ones(n_nodes, np.float32), n_nodes, n_nodes)


def inputs_for(n_cand):
    dec_src = jnp.asarray(rng.integers(0, n_nodes, n_cand)
                          .astype(np.int32))
    dec_dst = jnp.asarray(rng.integers(0, n_nodes, n_cand)
                          .astype(np.int32))
    labels = jnp.asarray((rng.random(n_cand) < 0.3).astype(np.float32))
    return ModelInputs(
        enc_graph=graph, dec_src=dec_src, dec_dst=dec_dst,
        drug_graph=eye, drug_sim_feat=x, drug_feat=x,
        dis_graph=eye, dis_sim_feat=x, dis_feat=x,
        drug_feature_graph=None, dis_feature_graph=None), labels


def model_for(layers):
    return ModelConfig(
        layers=layers, gcn_agg_units=384, gcn_out_units=128,
        src_in_units=d, dst_in_units=d, fdim_drug=d, fdim_disease=d,
        nhid1=256, nhid2=128, compute_dtype="bfloat16")


def step_ms(model, n_cand=1_000_000, n=8):
    cfg = TrainConfig(model=model, beta=0.0,
                      augment=AugmentConfig(methods=()))
    inputs, labels = inputs_for(n_cand)
    init_state, run_steps, *_ = make_train_fns(model, cfg)
    params = init_params(jax.random.key(0), model)
    state = init_state(params, jax.random.key(1, impl=cfg.rng_impl))
    state, losses = run_steps(state, inputs, labels, 1)
    float(losses[-1])
    t1 = tn = np.inf
    for _ in range(2):
        t0 = time.perf_counter()
        state, losses = run_steps(state, inputs, labels, 1)
        float(losses[-1])
        t1 = min(t1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        state, losses = run_steps(state, inputs, labels, n)
        float(losses[-1])
        tn = min(tn, time.perf_counter() - t0)
    return (tn - t1) / (n - 1) * 1e3


def fwd_ms(model, n_cand=1_000_000, n=8):
    """Forward-only (eval) over the train graph — no grad, no Adam."""
    cfg = TrainConfig(model=model, beta=0.0,
                      augment=AugmentConfig(methods=()))
    inputs, labels = inputs_for(n_cand)
    fns = make_train_fns(model, cfg)
    init_state = fns[0]
    evaluate = fns[2]
    params = init_params(jax.random.key(0), model)

    from dream_gnn_tpu.model.dream_gnn import forward

    # inputs/params ride as jit ARGUMENTS — closed-over layouts become
    # literal constants inside fori_loop and blow the remote-compile
    # request limit (utils/timing.py docstring).
    @jax.jit
    def chain(p, inp, n_link):
        def body(_, s):
            pred, *_rest = forward(
                jax.tree.map(lambda a: a + s * 1e-30, p), inp, model,
                train=False)
            return pred.reshape(-1)[0].astype(jnp.float32)
        return jax.lax.fori_loop(0, n_link, body,
                                 jnp.zeros((), jnp.float32))

    float(chain(params, inputs, 1))
    float(chain(params, inputs, n))
    t1 = tn = np.inf
    for _ in range(2):
        t0 = time.perf_counter()
        float(chain(params, inputs, 1))
        t1 = min(t1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(chain(params, inputs, n))
        tn = min(tn, time.perf_counter() - t0)
    return (tn - t1) / (n - 1) * 1e3


full = step_ms(model_for(3))
print(f"full step (3 layers, 1M cand, fwd+bwd+Adam)   {full:8.1f} ms",
      flush=True)
l1 = step_ms(model_for(1))
print(f"1 GCMC layer                                  {l1:8.1f} ms "
      f"-> per extra layer {(full - l1) / 2:.1f} ms", flush=True)
tiny_dec = step_ms(model_for(3), n_cand=8192)
print(f"3 layers, 8k candidates                       {tiny_dec:8.1f} ms "
      f"-> 1M-cand decoder ~ {full - tiny_dec:.1f} ms", flush=True)
f_only = fwd_ms(model_for(3))
print(f"forward only (3 layers, 1M cand)              {f_only:8.1f} ms "
      f"-> bwd+Adam ~ {full - f_only:.1f} ms", flush=True)

# Whole-step accountability vs the bare kernel (ROUND-4 CORRECTION of
# the round-3 "17 ms/layer of unattributed glue" claim): the honest
# per-layer bare prediction is the SUM OF PER-RELATION chained
# timings, not a pro-rata scaling of the monolithic 10M number —
# relation splitting has real per-call fixed costs and the 3M
# rating-1 layout's window-8 geometry is intrinsically slower per
# edge.  Measured round 4 (chained dispatch): fwd+bwd per relation
# 30.5 (fwd r0, 7M) + 18.8 (r1, 3M) + 30.3 + 18.8 = 98.5 ms bare sum;
# an spmm-only 4-relation layer measures 94.1 (XLA CSE of the shared
# cotangent packs BEATS the isolated sum) and the full gcmc layer
# (transforms + dropout + fc) 94.7 — transforms add 0.6 ms, not 17.
# A 6-point (span, window, tile_dst) sweep of the 3M relation found
# at most 0.6 ms more (window=5/tile=768: 17.37 vs auto's 18.00).
print(f"\nper-layer cost {(full - l1) / 2:.1f} ms vs honest bare "
      f"per-relation sum ~98.5 ms fwd+bwd (see round-4 note above; "
      f"the 4-relation composite measures BELOW the isolated sum)",
      flush=True)

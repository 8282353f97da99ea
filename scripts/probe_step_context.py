"""A/B the ~13 ms decoder step-context term (docs §4) against an
optimization_barrier fencing the encoder outputs from the decoder
phase: if the context is a pessimizing cross-phase XLA schedule, the
barrier recovers it; if it is genuine overlap, the barrier makes the
step SLOWER.  Measurement-only knob: model/dream_gnn._BARRIER_SCALE_DECODER.
"""

import _bootstrap  # noqa: F401

_bootstrap.setup_jax_cache()
import faulthandler, signal, time
faulthandler.dump_traceback_later(1000, repeat=True); signal.alarm(2300)
import numpy as np, jax, jax.numpy as jnp
from dream_gnn_tpu.config import AugmentConfig, ModelConfig, TrainConfig
from dream_gnn_tpu.graph.coo import coo_from_arrays
from dream_gnn_tpu.graph.slabbed import build_enc_graph_slabbed
from dream_gnn_tpu.kernels.pallas_scale_decoder import build_scale_decoder_layout
from dream_gnn_tpu.model.dream_gnn import ModelInputs, init_params
import dream_gnn_tpu.model.dream_gnn as dg
from dream_gnn_tpu.train.step import make_train_fns
n_nodes, n_edges, n_cand, d = 100_000, 10_000_000, 1_000_000, 128
rng = np.random.default_rng(0)
src = rng.integers(0, n_nodes, n_edges); dst = rng.integers(0, n_nodes, n_edges)
vals01 = (rng.random(n_edges) < 0.3).astype(np.float32)
x = jnp.asarray(rng.normal(size=(n_nodes, d)).astype(np.float32))
print("building graph...", flush=True)
graph = build_enc_graph_slabbed(np.stack([src, dst]), vals01, n_nodes, n_nodes)
csrc = rng.integers(0, n_nodes, n_cand).astype(np.int32)
cdst = rng.integers(0, n_nodes, n_cand).astype(np.int32)
lay = build_scale_decoder_layout(csrc, cdst, n_nodes, n_nodes)
labels, weights = lay.slot_labels(jnp.asarray((rng.random(n_cand) < 0.3).astype(np.float32)))
eye = coo_from_arrays(np.arange(n_nodes), np.arange(n_nodes), np.ones(n_nodes, np.float32), n_nodes, n_nodes)
model = ModelConfig(layers=3, gcn_agg_units=384, gcn_out_units=128, src_in_units=d,
                    dst_in_units=d, fdim_drug=d, fdim_disease=d, nhid1=256, nhid2=128,
                    compute_dtype="bfloat16", decoder_backend="pallas")
inputs = ModelInputs(enc_graph=graph, dec_src=jnp.asarray(csrc), dec_dst=jnp.asarray(cdst),
                     drug_graph=eye, drug_sim_feat=x, drug_feat=x, dis_graph=eye,
                     dis_sim_feat=x, dis_feat=x, drug_feature_graph=None,
                     dis_feature_graph=None, dec_layout=lay)
cfg = TrainConfig(model=model, beta=0.0, augment=AugmentConfig(methods=()))
def step_ms(n=8):
    init_state, run_steps, *_ = make_train_fns(model, cfg)
    params = init_params(jax.random.key(0), model)
    state = init_state(params, jax.random.key(1, impl=cfg.rng_impl))
    state, losses = run_steps(state, inputs, labels, 1, edge_weight=weights)
    float(losses[-1])
    state, losses = run_steps(state, inputs, labels, n, edge_weight=weights)
    float(losses[-1])
    t1 = tn = np.inf
    for _ in range(2):
        t0 = time.perf_counter()
        state, losses = run_steps(state, inputs, labels, 1, edge_weight=weights)
        float(losses[-1]); t1 = min(t1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        state, losses = run_steps(state, inputs, labels, n, edge_weight=weights)
        float(losses[-1]); tn = min(tn, time.perf_counter() - t0)
    return (tn - t1) / (n - 1) * 1e3
for flag in (False, True):
    dg._BARRIER_SCALE_DECODER = flag
    ms = step_ms()
    print(f"barrier={flag}: full step {ms:.1f} ms", flush=True)

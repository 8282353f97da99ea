"""Probe: compile/time one jitted train step with the pallas decoder."""

import _bootstrap  # noqa: F401  (repo root on sys.path)

_bootstrap.setup_jax_cache()

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp

from dream_gnn_tpu.config import TrainConfig
from dream_gnn_tpu.data.loader import DreamDataset
from dream_gnn_tpu.model.dream_gnn import init_params
from dream_gnn_tpu.train.loop import derive_model_cfg, fold_inputs
from dream_gnn_tpu.train.optim import make_optimizer
from dream_gnn_tpu.train.step import TrainState, make_one_step

scan_len = int(sys.argv[1]) if len(sys.argv) > 1 else 0

cfg = TrainConfig(data_name="lrssl")
dataset = DreamDataset.load("lrssl", k=cfg.num_neighbor)
model_cfg = dataclasses.replace(derive_model_cfg(cfg, dataset),
                                decoder_backend="pallas",
                                compute_dtype="bfloat16")
inputs, _, labels, _ = fold_inputs(dataset, 0)
tx = make_optimizer(cfg.train_grad_clip, cfg.weight_decay)
one_step = make_one_step(model_cfg, cfg, tx)
params = init_params(jax.random.key(0), model_cfg)
state = TrainState(params=params, opt_state=tx.init(params),
                   key=jax.random.key(1, impl=cfg.rng_impl),
                   lr=jnp.asarray(cfg.train_lr))

if scan_len:
    @jax.jit
    def run(state):
        return jax.lax.scan(lambda c, _: one_step(c, inputs, labels),
                            state, length=scan_len)
    t0 = time.perf_counter()
    state, losses = run(state)
    float(losses[-1])
    print(f"scan[{scan_len}] compile+run: {time.perf_counter()-t0:.1f}s",
          flush=True)
    for _ in range(3):
        t0 = time.perf_counter()
        state, losses = run(state)
        float(losses[-1])
        print(f"scan[{scan_len}]: {(time.perf_counter()-t0)/scan_len*1e3:.2f} "
              f"ms/step loss={float(losses[-1]):.4f}", flush=True)
else:
    step = jax.jit(one_step)
    t0 = time.perf_counter()
    state, loss = step(state, inputs, labels)
    float(loss)
    print(f"single step compile+run: {time.perf_counter()-t0:.1f}s",
          flush=True)
    for _ in range(5):
        t0 = time.perf_counter()
        state, loss = step(state, inputs, labels)
        float(loss)
        print(f"single step: {(time.perf_counter()-t0)*1e3:.2f} ms "
              f"loss={float(loss):.4f}", flush=True)

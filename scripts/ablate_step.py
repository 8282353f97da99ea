"""Ablation timing of the lrssl train step (honest scan-based timing).

Identical-arg microbenchmarks are unreliable through the axon relay
(results appear cached), so every measurement here is a 50-iteration
compiled scan with threaded state — the same harness bench.py uses.
"""

import _bootstrap  # noqa: F401  (repo root on sys.path)

_bootstrap.setup_jax_cache()

import dataclasses
import sys
import time

import jax
import numpy as np

from dream_gnn_tpu.config import TrainConfig
from dream_gnn_tpu.data.loader import DreamDataset
from dream_gnn_tpu.model.dream_gnn import init_params
from dream_gnn_tpu.train.loop import derive_model_cfg, fold_inputs
from dream_gnn_tpu.train.step import make_train_fns

STEPS = 50


def measure(name, cfg, model_cfg, dataset, inputs, labels):
    init_state, run_steps, *_ = make_train_fns(model_cfg, cfg)
    params = init_params(jax.random.key(0), model_cfg)
    state = init_state(params, jax.random.key(1))
    state, losses = run_steps(state, inputs, labels, STEPS)  # compile+warm
    float(losses[-1])
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        state, losses = run_steps(state, inputs, labels, STEPS)
        last = float(losses[-1])          # force full materialisation
        times.append(time.perf_counter() - t0)
    ms = min(times) / STEPS * 1e3
    print(f"{name:42s} {ms:7.2f} ms/step   last_loss={last:.4f} "
          f"times={[round(t, 3) for t in times]}", flush=True)
    return ms


def main():
    cfg = TrainConfig(data_name="lrssl")
    dataset = DreamDataset.load("lrssl", k=cfg.num_neighbor)
    model_cfg = derive_model_cfg(cfg, dataset)
    inputs, _, labels, _ = fold_inputs(dataset, 0)

    base = measure("full step", cfg, model_cfg, dataset, inputs, labels)

    no_aug = dataclasses.replace(
        cfg, augment=dataclasses.replace(cfg.augment, methods=()))
    measure("no augmentation", no_aug, model_cfg, dataset, inputs, labels)

    no_beta = dataclasses.replace(cfg, beta=0.0)
    measure("no common loss", no_beta, model_cfg, dataset, inputs, labels)

    small_dec = dataclasses.replace(inputs,
                                    dec_src=inputs.dec_src[:8192],
                                    dec_dst=inputs.dec_dst[:8192])
    measure("decoder 8k edges (vs 467k)", cfg, model_cfg, dataset,
            small_dec, labels[:8192])

    one_layer = dataclasses.replace(model_cfg, layers=1)
    measure("1 GCMC layer (vs 3)", cfg, one_layer, dataset, inputs, labels)

    no_drop = dataclasses.replace(model_cfg, dropout=0.0,
                                  attention_dropout=0.0)
    measure("no dropout", cfg, no_drop, dataset, inputs, labels)


if __name__ == "__main__":
    main()

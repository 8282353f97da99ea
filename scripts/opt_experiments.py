"""Optimization experiments for the decoder-dominated train step."""

import _bootstrap  # noqa: F401  (repo root on sys.path)

_bootstrap.setup_jax_cache()

import dataclasses
import time

import jax
import jax.numpy as jnp

from dream_gnn_tpu.config import TrainConfig
from dream_gnn_tpu.data.loader import DreamDataset
from dream_gnn_tpu.model.dream_gnn import init_params
from dream_gnn_tpu.train.loop import derive_model_cfg, fold_inputs
from dream_gnn_tpu.train.step import make_train_fns

STEPS = 50


def measure(name, cfg, model_cfg, inputs, labels, key_impl=None):
    init_state, run_steps, *_ = make_train_fns(model_cfg, cfg)
    params = init_params(jax.random.key(0), model_cfg)
    key = (jax.random.key(1) if key_impl is None
           else jax.random.key(1, impl=key_impl))
    state = init_state(params, key)
    state, losses = run_steps(state, inputs, labels, STEPS)
    float(losses[-1])
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        state, losses = run_steps(state, inputs, labels, STEPS)
        last = float(losses[-1])
        times.append(time.perf_counter() - t0)
    ms = min(times) / STEPS * 1e3
    print(f"{name:40s} {ms:7.2f} ms/step  loss={last:.4f}", flush=True)


def main():
    cfg = TrainConfig(data_name="lrssl")
    dataset = DreamDataset.load("lrssl", k=cfg.num_neighbor)
    model_cfg = derive_model_cfg(cfg, dataset)
    inputs, _, labels, _ = fold_inputs(dataset, 0)

    measure("baseline (threefry, fp32)", cfg, model_cfg, inputs, labels)
    measure("rbg keys", cfg, model_cfg, inputs, labels, key_impl="rbg")
    measure("unsafe_rbg keys", cfg, model_cfg, inputs, labels,
            key_impl="unsafe_rbg")

    bf16 = dataclasses.replace(model_cfg, compute_dtype="bfloat16")
    measure("bf16 compute", cfg, bf16, inputs, labels)
    measure("bf16 + unsafe_rbg", cfg, bf16, inputs, labels,
            key_impl="unsafe_rbg")

    nodrop = dataclasses.replace(model_cfg, dropout=0.0)
    measure("no dropout (upper bound)", cfg, nodrop, inputs, labels)


if __name__ == "__main__":
    main()

def main2():
    cfg = TrainConfig(data_name="lrssl")
    dataset = DreamDataset.load("lrssl", k=cfg.num_neighbor)
    model_cfg = derive_model_cfg(cfg, dataset)
    inputs, _, labels, _ = fold_inputs(dataset, 0)
    pallas_bf16 = dataclasses.replace(model_cfg, decoder_backend="pallas",
                                      compute_dtype="bfloat16")
    measure("pallas dec + bf16 + rbg", cfg, pallas_bf16, inputs, labels,
            key_impl="rbg")
    pallas_fp32 = dataclasses.replace(model_cfg, decoder_backend="pallas")
    measure("pallas dec + fp32 + rbg", cfg, pallas_fp32, inputs, labels,
            key_impl="rbg")

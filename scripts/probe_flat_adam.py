"""Measure optax.flatten on the stacked step's vmapped Adam chain.

The protocol-step ablation (scripts/ablate_protocol_step.py) puts the
optimizer at 1.38 ms of the 18.6 ms step — ~50 per-leaf elementwise
kernels x 10 folds.  optax.flatten ravels the pytree once per update so
the whole chain runs as a handful of (P,)-vector ops; this probe checks
whether the ravel/unravel copies eat the dispatch win.
"""

import _bootstrap  # noqa: F401

_bootstrap.setup_jax_cache()

import dataclasses
import time
from functools import partial

import jax
import jax.numpy as jnp
import optax

from dream_gnn_tpu.config import TrainConfig
from dream_gnn_tpu.data.loader import DreamDataset
from dream_gnn_tpu.model.dream_gnn import init_params
from dream_gnn_tpu.sharding.foldstack import stack_folds
from dream_gnn_tpu.train.loop import derive_model_cfg
from dream_gnn_tpu.train.optim import make_optimizer
from dream_gnn_tpu.train.stacked import make_one_step_stacked
from dream_gnn_tpu.train.step import TrainState

STEPS = 50
FOLDS = 10


def measure(name, tx, cfg, model_cfg, dataset):
    one_step = make_one_step_stacked(model_cfg, cfg, tx)

    @partial(jax.jit, donate_argnums=(0,))
    def run(state, tr):
        def body(carry, _):
            return one_step(carry, tr.inputs, tr.labels, tr.edge_weight)

        return jax.lax.scan(body, state, length=STEPS)

    tr = stack_folds(dataset, list(range(FOLDS)), side="train")
    keys = jnp.stack([jax.random.fold_in(
        jax.random.key(77, impl=cfg.rng_impl), cv) for cv in range(FOLDS)])

    def _one(fold_key):
        k_params, k_state = jax.random.split(fold_key)
        params = init_params(k_params, model_cfg)
        return TrainState(params=params, opt_state=tx.init(params),
                          key=k_state,
                          lr=jnp.asarray(cfg.train_lr, jnp.float32))

    state = jax.jit(jax.vmap(_one))(keys)
    state, losses = run(state, tr)
    jax.block_until_ready(losses)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        state, losses = run(state, tr)
        jax.block_until_ready(losses)
        times.append(time.perf_counter() - t0)
    ms = min(times) / STEPS * 1e3
    print(f"{name:28s} {ms:7.2f} ms/step  loss={float(jnp.sum(losses)):.4f}",
          flush=True)
    return ms


def main():
    cfg = TrainConfig(data_name="lrssl")
    dataset = DreamDataset.load("lrssl", k=cfg.num_neighbor)
    model_cfg = dataclasses.replace(derive_model_cfg(cfg, dataset),
                                    decoder_backend="pallas",
                                    compute_dtype="bfloat16",
                                    decode_mode="grid")
    n_params = sum(x.size for x in jax.tree.leaves(
        init_params(jax.random.key(0), model_cfg)))
    print(f"params/fold: {n_params:,} "
          f"({n_params * 4 / 2**20:.1f} MiB f32)", flush=True)

    tx = make_optimizer(cfg.train_grad_clip, cfg.weight_decay)
    measure("vmapped tree Adam (base)", tx, cfg, model_cfg, dataset)
    measure("optax.flatten Adam", optax.flatten(tx), cfg, model_cfg, dataset)


if __name__ == "__main__":
    main()

"""Fine-grained attribution of the HEADLINE protocol step (VERDICT r3 #5).

The round-4 floor account for the 10-fold fold-parallel step measured
18.41 ms = 3.91 dropout + 1.0 augmentation + "~13.5 pipeline/encoder/
optimizer" — this script splits that lump.  Every number is a
50-iteration compiled `lax.scan` (min over repeats), the same harness
bench.py uses, because identical-arg microbenchmarks read as cached
through the axon relay (utils/timing.py).

Variants beyond config toggles need surgery the config can't express,
so two custom steps are built from the same internals stacked.py uses:

  fwd-only        loss_fn under the scan, no grad, no optimizer
  grad-no-opt     value_and_grad, but Adam update + apply skipped

Run: python scripts/ablate_protocol_step.py  (real TPU)
"""

import _bootstrap  # noqa: F401

_bootstrap.setup_jax_cache()

import dataclasses
import time
from functools import partial

import jax
import jax.numpy as jnp

from dream_gnn_tpu.augment.masks import augment_inputs
from dream_gnn_tpu.config import TrainConfig
from dream_gnn_tpu.data.loader import DreamDataset
from dream_gnn_tpu.model.dream_gnn import forward_stacked, init_params
from dream_gnn_tpu.sharding.foldstack import stack_folds
from dream_gnn_tpu.train.loop import derive_model_cfg
from dream_gnn_tpu.train.losses import total_loss
from dream_gnn_tpu.train.optim import make_optimizer
from dream_gnn_tpu.train.stacked import make_stacked_train_fns
from dream_gnn_tpu.train.step import TrainState

STEPS = 50
REPEATS = 3
FOLDS = 10


def _time_scan(run, state, tr):
    state2, out = run(state, tr)  # compile + warm
    jax.block_until_ready(out)
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        state2, out = run(state2, tr)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return min(times) / STEPS * 1e3


def measure_cfg(name, cfg, model_cfg, dataset, base_ms=None):
    fns = make_stacked_train_fns(model_cfg, cfg)
    tr = stack_folds(dataset, list(range(FOLDS)), side="train")
    keys = jnp.stack([jax.random.fold_in(
        jax.random.key(77, impl=cfg.rng_impl), cv) for cv in range(FOLDS)])
    state = fns[0](keys)
    ms = _time_scan(lambda s, t: fns[1](s, t, STEPS), state, tr)
    delta = "" if base_ms is None else f"   delta={base_ms - ms:+6.2f}"
    print(f"{name:34s} {ms:7.2f} ms/step{delta}", flush=True)
    return ms


def make_partial_step(model_cfg, cfg, *, with_grad, with_opt):
    """The stacked step with the tail amputated (mirrors
    train/stacked.py:make_one_step_stacked — same PRNG threading, same
    augmentation, same loss)."""
    augment = cfg.augment
    grid = model_cfg.decode_mode == "grid"
    tx = make_optimizer(cfg.train_grad_clip, cfg.weight_decay)

    def loss_fn(params, inputs, labels, keys_fwd, edge_masks, edge_weight):
        pred, d_o, ds_o, i_o, is_o = forward_stacked(
            params, inputs, model_cfg, train=True, key=keys_fwd,
            edge_masks=edge_masks)
        if grid:
            f = pred.shape[0]
            pred = pred.reshape(f, -1)
            labels = inputs.enc_graph.a1.reshape(f, -1)
            edge_weight = inputs.enc_graph.mask.reshape(f, -1)
        losses = jax.vmap(
            lambda p, l, a, b, c, d, w: total_loss(
                p, l, a, b, c, d, beta=cfg.beta,
                smoothing=cfg.label_smoothing, weight=w)[0])(
            pred, labels, d_o, ds_o, i_o, is_o, edge_weight)
        return jnp.sum(losses), losses

    def one_step(state, inputs, labels, edge_weight):
        keys = jax.vmap(lambda k: jax.random.split(k, 3))(state.key)
        k_new, k_aug, k_fwd = keys[:, 0], keys[:, 1], keys[:, 2]
        aug_inputs, edge_masks = jax.vmap(
            lambda k, i: augment_inputs(
                k, i, augment, num_ratings=model_cfg.num_ratings))(
            k_aug, inputs)
        if not with_grad:
            _, losses = loss_fn(state.params, aug_inputs, labels, k_fwd,
                                edge_masks, edge_weight)
            return dataclasses.replace(state, key=k_new), losses
        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, aug_inputs, labels, k_fwd, edge_masks,
            edge_weight)
        if not with_opt:
            # Consume the grads so XLA cannot DCE the backward: fold a
            # scalar trace of them into the carried key (cheap, honest).
            tr = sum(jnp.sum(g).astype(jnp.float32) * 0.0
                     for g in jax.tree.leaves(grads))
            losses = losses + tr
            return dataclasses.replace(state, key=k_new), losses
        updates, opt_state = jax.vmap(tx.update)(grads, state.opt_state,
                                                 state.params)
        lr = state.lr

        def _apply(p, u):
            return p - lr.reshape((-1,) + (1,) * (u.ndim - 1)) * u

        params = jax.tree.map(_apply, state.params, updates)
        return TrainState(params=params, opt_state=opt_state, key=k_new,
                          lr=lr), losses

    @partial(jax.jit, donate_argnums=(0,))
    def run(state, tr):
        def body(carry, _):
            return one_step(carry, tr.inputs, tr.labels, tr.edge_weight)

        return jax.lax.scan(body, state, length=STEPS)

    return tx, run


def measure_partial(name, cfg, model_cfg, dataset, base_ms, **kw):
    tx, run = make_partial_step(model_cfg, cfg, **kw)
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
    ms = _time_scan(run, state, tr)
    print(f"{name:34s} {ms:7.2f} ms/step   delta={base_ms - ms:+6.2f}",
          flush=True)
    return ms


def main():
    cfg = TrainConfig(data_name="lrssl")
    dataset = DreamDataset.load("lrssl", k=cfg.num_neighbor)
    model_cfg = dataclasses.replace(derive_model_cfg(cfg, dataset),
                                    decoder_backend="pallas",
                                    compute_dtype="bfloat16",
                                    decode_mode="grid")
    print(f"lrssl {dataset.n_drug}x{dataset.n_dis}, {FOLDS} folds, "
          f"{STEPS}-step scans, min of {REPEATS}", flush=True)

    base = measure_cfg("full step", cfg, model_cfg, dataset)
    measure_partial("fwd only (no grad, no opt)", cfg, model_cfg, dataset,
                    base, with_grad=False, with_opt=False)
    measure_partial("fwd+bwd (no optimizer)", cfg, model_cfg, dataset,
                    base, with_grad=True, with_opt=False)
    measure_cfg("no dropout", cfg,
                dataclasses.replace(model_cfg, dropout=0.0,
                                    attention_dropout=0.0),
                dataset, base)
    measure_cfg("no augmentation",
                dataclasses.replace(cfg, augment=dataclasses.replace(
                    cfg.augment, methods=())),
                model_cfg, dataset, base)
    measure_cfg("no common loss (beta=0)",
                dataclasses.replace(cfg, beta=0.0),
                model_cfg, dataset, base)
    measure_cfg("XLA grid decoder", cfg,
                dataclasses.replace(model_cfg, decoder_backend="xla"),
                dataset, base)
    measure_cfg("1 GCMC layer (vs 3)", cfg,
                dataclasses.replace(model_cfg, layers=1),
                dataset, base)


if __name__ == "__main__":
    main()

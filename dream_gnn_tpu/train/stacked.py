"""Fold-parallel training on ONE chip (or a mesh): all CV folds of a
seed advance together as a vmapped batch.

The reference runs folds strictly sequentially (train.py:500).  At
reference dataset scale (hundreds of nodes) a single fold leaves the
MXU mostly idle — every matmul is far below the 128x128 systolic tile
budget — so batching the F=10 independent folds into one vmapped train
step multiplies per-chip throughput at nearly constant step time.  One
compiled dispatch covers a whole eval interval for *all* folds: a
``lax.scan`` over the vmapped step plus vmapped train/test evaluation.

The per-edge decoder — the step's HBM-bound hot spot — runs in the
fold-batched fused Pallas kernel (kernels/pallas_decoder_batched.py);
a plain ``jax.vmap`` of the step would fall back to the XLA decoder
and lose the fusion win (measured 22 ms/fold-step vs 5.7 ms fused).

Numerics: each fold uses exactly the per-fold PRNG key the sequential
harness would use (``fold_in(seed_key, cv)``).  Under the
``threefry2x32`` PRNG (vmap-invariant) a stacked run with the XLA
decoder backend is sample-for-sample the sequential run — enforced by
tests/test_foldparallel.py.  Under the default ``rbg`` impl the
batched RngBitGenerator draws a different (equally distributed) stream
for batch indices > 0, so runs are statistically equivalent only.
Parity traps carried over: test evaluation runs the encoder on the
*test* encoder graph (SURVEY §7.3.1), plateau LR is per-fold on the
host, best-by-test-AUPR selection is per fold.
"""

from __future__ import annotations

import dataclasses
import os
import time
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from dream_gnn_tpu.augment.masks import augment_inputs
from dream_gnn_tpu.config import ModelConfig, TrainConfig
from dream_gnn_tpu.data.loader import DreamDataset
from dream_gnn_tpu.model.dream_gnn import (ModelInputs, forward_stacked,
                                           init_params)
from dream_gnn_tpu.sharding.foldstack import StackedFolds, stack_folds
from dream_gnn_tpu.train.losses import total_loss
from dream_gnn_tpu.train.optim import PlateauScheduler, make_optimizer
from dream_gnn_tpu.train.step import TrainState
from dream_gnn_tpu.utils.logging import MetricLogger
from dream_gnn_tpu.utils.metrics import aupr_masked, auroc_masked


def make_one_step_stacked(model_cfg: ModelConfig, train_cfg: TrainConfig,
                          tx, mesh=None):
    """Fold-batched single iteration: vmapped augment + encoder, the
    fold-batched fused decoder (kernels/pallas_decoder_batched.py), a
    summed-loss grad (folds are independent, so the stacked grad is
    exactly the per-fold grads), and a vmapped optimizer update with a
    per-fold learning rate.

    PRNG threading per fold matches train.step.make_one_step (same
    split counts), so under the vmap-invariant threefry impl this is
    sample-for-sample the sequential step.
    """
    augment = train_cfg.augment
    grid = model_cfg.decode_mode == "grid"

    def loss_fn(params, inputs: ModelInputs, labels, keys_fwd, edge_masks,
                edge_weight):
        pred, drug_out, drug_sim_out, dis_out, dis_sim_out = forward_stacked(
            params, inputs, model_cfg, train=True, key=keys_fwd,
            edge_masks=edge_masks, mesh=mesh)
        if grid:
            f = pred.shape[0]
            pred = pred.reshape(f, -1)
            labels = inputs.enc_graph.a1.reshape(f, -1)
            edge_weight = inputs.enc_graph.mask.reshape(f, -1)
        losses = jax.vmap(
            lambda p, l, a, b, c, d, w: total_loss(
                p, l, a, b, c, d, beta=train_cfg.beta,
                smoothing=train_cfg.label_smoothing, weight=w)[0])(
            pred, labels, drug_out, drug_sim_out, dis_out, dis_sim_out,
            edge_weight)
        return jnp.sum(losses), losses

    def one_step(state: TrainState, inputs, labels, edge_weight):
        keys = jax.vmap(lambda k: jax.random.split(k, 3))(state.key)
        k_new, k_aug, k_fwd = keys[:, 0], keys[:, 1], keys[:, 2]
        aug_inputs, edge_masks = jax.vmap(
            lambda k, i: augment_inputs(
                k, i, augment, num_ratings=model_cfg.num_ratings))(
            k_aug, inputs)
        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, aug_inputs, labels, k_fwd, edge_masks,
            edge_weight)
        updates, opt_state = jax.vmap(tx.update)(grads, state.opt_state,
                                                 state.params)
        lr = state.lr

        def _apply(p, u):
            return p - lr.reshape((-1,) + (1,) * (u.ndim - 1)) * u

        params = jax.tree.map(_apply, state.params, updates)
        return TrainState(params=params, opt_state=opt_state, key=k_new,
                          lr=lr), losses

    return one_step


def make_stacked_train_fns(model_cfg: ModelConfig, train_cfg: TrainConfig,
                           mesh=None):
    """(init_state, run_steps, run_interval) over a stacked fold axis.

    All leaves of ``TrainState`` carry a leading fold axis F.  The lr
    is a (F,) vector the host-side per-fold plateau schedulers rewrite
    between intervals.

    ``mesh``: compile for the dp x mp multi-chip layout — the fused
    Pallas decoders run under their shard_map partitioning rules
    instead of being swapped for the XLA lowerings
    (sharding/partition.py:make_multichip_train_fns).
    """
    tx = make_optimizer(train_cfg.train_grad_clip, train_cfg.weight_decay)
    one_step = make_one_step_stacked(model_cfg, train_cfg, tx, mesh=mesh)

    @jax.jit
    def init_state(fold_keys) -> TrainState:
        """Per-fold params/opt state from the sequential harness's
        per-fold keys (split into param/state keys exactly like
        loop.py:89-91)."""
        def _one(fold_key):
            k_params, k_state = jax.random.split(fold_key)
            params = init_params(k_params, model_cfg)
            return TrainState(
                params=params, opt_state=tx.init(params), key=k_state,
                lr=jnp.asarray(train_cfg.train_lr, jnp.float32))

        return jax.vmap(_one)(fold_keys)

    @partial(jax.jit, static_argnames=("n_steps",), donate_argnums=(0,))
    def run_steps(state: TrainState, train: StackedFolds, n_steps: int):
        def body(carry, _):
            return one_step(carry, train.inputs, train.labels,
                            train.edge_weight)

        state, losses = jax.lax.scan(body, state, length=n_steps)
        return state, losses[-1]

    def _eval_stacked(params, stacked: StackedFolds):
        pred, *_ = forward_stacked(params, stacked.inputs, model_cfg,
                                   train=False, mesh=mesh)
        if model_cfg.decode_mode == "grid":
            f = pred.shape[0]
            pred = pred.reshape(f, -1)
            labels = stacked.inputs.enc_graph.a1.reshape(f, -1)
            w = stacked.inputs.enc_graph.mask.reshape(f, -1)
        else:
            labels, w = stacked.labels, stacked.edge_weight
        return (jax.vmap(auroc_masked)(labels, pred, w),
                jax.vmap(aupr_masked)(labels, pred, w))

    @partial(jax.jit, static_argnames=("n_steps",), donate_argnums=(0,))
    def run_interval(state: TrainState, train: StackedFolds,
                     test: StackedFolds, n_steps: int):
        """One dispatch: n training steps + train eval + test eval for
        every fold.  Returns (state, (F,5) metrics: loss, train_auroc,
        train_aupr, test_auroc, test_aupr)."""
        state, last_loss = run_steps(state, train, n_steps)
        tr = _eval_stacked(state.params, train)
        te = _eval_stacked(state.params, test)
        metrics = jnp.stack([last_loss, tr[0], tr[1], te[0], te[1]], axis=1)
        return state, metrics

    return init_state, run_steps, run_interval


def train_seed_foldparallel(
        dataset: DreamDataset, cfg: TrainConfig, seed_key: jax.Array,
        folds: Sequence[int], *, save_dir: Optional[str] = None,
        verbose: bool = True, train_fns=None, model_cfg=None,
        resume: Optional[bool] = None):
    """Train every fold of one seed simultaneously; returns a list of
    per-fold result dicts (same contract as loop.train_fold) plus the
    reusable compiled fns.  Thin wrapper over
    :func:`train_stacked_protocol` with a single seed.
    """
    results, train_fns = train_stacked_protocol(
        dataset, cfg, [seed_key], folds, save_dirs=[save_dir],
        verbose=verbose, train_fns=train_fns, model_cfg=model_cfg,
        resume=resume)
    return results[0], train_fns


def train_stacked_protocol(
        dataset: DreamDataset, cfg: TrainConfig,
        seed_keys: Sequence[jax.Array], folds: Sequence[int], *,
        save_dirs: Optional[Sequence[Optional[str]]] = None,
        verbose: bool = True, train_fns=None, model_cfg=None,
        resume: Optional[bool] = None):
    """Train S seeds x F folds simultaneously as ONE (S*F)-way stacked
    batch; returns (per-seed lists of per-fold result dicts, fns).

    Seed-parallel stacking (no reference counterpart — the reference
    runs seeds AND folds strictly sequentially, train.py:471,500): the
    fold-batched step's matmuls are still far below the MXU tile budget
    at reference dataset scale, so stacking every (seed, fold) pair of
    the whole protocol into one compiled step raises per-chip
    throughput again at near-constant step time (measured in
    BASELINE.md).  Folds of every seed share the same stacked graph
    data — only the PRNG keys differ — so the data cost is tiling the
    F-fold stack S times.

    Artifact contract matches the sequential path: per-fold
    ``test_metric{i}.csv`` / ``best_metric{i}.csv`` under each seed's
    ``save_dirs[s]``.

    Failure recovery: with ``cfg.checkpoint_every`` the whole stacked
    state (all items' params/optimizer/PRNG/lr — ONE pytree) plus the
    per-item plateau schedulers and best-by-AUPR bookkeeping is written
    atomically to ``ckpt_stacked.npz`` under the first non-None seed
    dir; with ``resume``
    (default ``cfg.resume``) a preempted run restarts from it with an
    identical stream, and CSV rows past the checkpoint are dropped so
    the resumed artifacts match an uninterrupted run byte for byte
    (tests/test_resume.py).  The reference can only save final params,
    never resume (train.py:342-351).
    """
    from dream_gnn_tpu.train.loop import derive_model_cfg

    if model_cfg is None:
        model_cfg = derive_model_cfg(cfg, dataset)
    if train_fns is None:
        train_fns = make_stacked_train_fns(model_cfg, cfg)
    init_state, run_steps, run_interval = train_fns

    folds = list(folds)
    seed_keys = list(seed_keys)
    n_seeds = len(seed_keys)
    if save_dirs is None:
        save_dirs = [None] * n_seeds
    # Item axis = (seed-major, fold-minor); per-item key threading is
    # exactly the sequential harness's fold_in(seed_key, cv).
    items = [(si, cv) for si in range(n_seeds) for cv in folds]
    n_folds = len(items)
    # Checkpoint anchor = first seed dir that is actually set (NOT
    # blindly save_dirs[0]: a None first entry must not silently
    # disable artifacts for every other seed).
    save_dir = next((d for d in save_dirs if d), None)

    def _tile(stacked: StackedFolds) -> StackedFolds:
        if n_seeds == 1:
            return stacked
        return jax.tree.map(
            lambda a: jnp.concatenate([a] * n_seeds, axis=0), stacked)

    train_stacked = _tile(stack_folds(dataset, folds, side="train"))
    test_stacked = _tile(stack_folds(dataset, folds, side="test"))
    fold_keys = jnp.stack([jax.random.fold_in(seed_keys[si], cv)
                           for si, cv in items])
    state = init_state(fold_keys)

    plateaus = [PlateauScheduler(cfg.train_lr, patience=cfg.plateau_patience,
                                 factor=cfg.plateau_factor)
                for _ in items]
    best = [dict(aupr=-1.0, auroc=0.0, iter=0, train_aupr=0.0,
                 train_auroc=0.0) for _ in items]
    best_params = [None] * n_folds

    resume = cfg.resume if resume is None else resume
    ckpt_path = (os.path.join(save_dir, "ckpt_stacked.npz")
                 if save_dir else None)
    start_iter = 0
    if resume and ckpt_path and os.path.exists(ckpt_path):
        from dream_gnn_tpu.train.checkpoint import load_train_state

        state, start_iter, extra = load_train_state(
            ckpt_path, state, None, with_extra=True)
        # A stale checkpoint from a run with a different (seeds x
        # folds) stacking must fail cleanly, not KeyError mid-restore
        # or silently partially restore the plateau schedulers.
        n_ckpt = len(np.asarray(extra["plateau"]))
        if n_ckpt != n_folds or len(extra["best"]) != n_folds:
            raise ValueError(
                f"{ckpt_path} holds {n_ckpt} stacked items but this run "
                f"stacks {n_folds} ({n_seeds} seeds x {len(folds)} "
                f"folds) — delete the stale checkpoint or match the "
                f"stacking it was written with")
        for i, row in enumerate(np.asarray(extra["plateau"])):
            plateaus[i].lr = float(row[0])
            plateaus[i].best = float(row[1])
            plateaus[i].num_bad = int(row[2])
        for i in range(n_folds):
            b = extra["best"][f"f{i}"]
            best[i] = {k: (int(v) if k == "iter" else float(v))
                       for k, v in b.items()}
            bp = extra["best_params"].get(f"f{i}") or None
            best_params[i] = bp if bp else None
        if verbose:
            print(f"Resumed stacked run from {ckpt_path} "
                  f"at iter {start_iter}")

    for d in save_dirs:
        if d:
            os.makedirs(d, exist_ok=True)
    loggers = [MetricLogger(
        ["iter", "loss", "train_auroc", "train_aupr",
         "test_auroc", "test_aupr"],
        ["%d", "%.4f", "%.4f", "%.4f", "%.4f", "%.4f"],
        os.path.join(save_dirs[si], f"test_metric{cv + 1}.csv"),
        resume_iter=start_iter if start_iter else None)
        if save_dirs[si] else None
        for si, cv in items]

    total_iters = cfg.train_max_iter - 1       # range(1, max_iter)
    done = start_iter
    t0 = time.perf_counter()
    steps_timed = 0
    time_in_steps = 0.0

    while done < total_iters:
        chunk = min(cfg.train_valid_interval, total_iters - done)
        t_s = time.perf_counter()
        if chunk != cfg.train_valid_interval:
            # Trailing partial chunk: reference never evals there.
            state, losses = run_steps(state, train_stacked, chunk)
            jax.block_until_ready(losses)
            done += chunk
            time_in_steps += time.perf_counter() - t_s
            steps_timed += chunk
            break
        state, metrics = run_interval(state, train_stacked, test_stacked,
                                      chunk)
        metrics = np.asarray(jax.device_get(metrics))      # (F, 5)
        time_in_steps += time.perf_counter() - t_s
        steps_timed += chunk
        done += chunk

        new_lrs = np.array(jax.device_get(state.lr))
        lr_changed = False
        for i in range(n_folds):
            loss, tr_auroc, tr_aupr, te_auroc, te_aupr = (
                float(x) for x in metrics[i])
            lr_i = plateaus[i].step(te_aupr)
            if lr_i != float(new_lrs[i]):
                new_lrs[i] = lr_i
                lr_changed = True
            if loggers[i]:
                loggers[i].log(iter=done, loss=loss, train_auroc=tr_auroc,
                               train_aupr=tr_aupr, test_auroc=te_auroc,
                               test_aupr=te_aupr)
            if te_aupr > best[i]["aupr"]:
                best[i] = dict(aupr=te_aupr, auroc=te_auroc, iter=done,
                               train_aupr=tr_aupr, train_auroc=tr_auroc)
                if cfg.save_model:
                    best_params[i] = jax.tree.map(
                        lambda x, i=i: np.asarray(x[i]), state.params)
        if lr_changed:
            state = dataclasses.replace(
                state, lr=jnp.asarray(new_lrs, jnp.float32))
        if cfg.checkpoint_every and ckpt_path \
                and done % cfg.checkpoint_every == 0:
            from dream_gnn_tpu.train.checkpoint import save_train_state

            save_train_state(
                ckpt_path, state, done, None,
                extra={
                    "plateau": np.asarray(
                        [[p.lr, p.best, float(p.num_bad)]
                         for p in plateaus]),
                    "best": {f"f{i}": {k: np.asarray(v)
                                       for k, v in best[i].items()}
                             for i in range(n_folds)},
                    "best_params": {f"f{i}": best_params[i] or {}
                                    for i in range(n_folds)},
                })
        if verbose:
            m = metrics.mean(axis=0)
            print(f"Iter={done:5d}, Loss={m[0]:.4f}, "
                  f"Train: AUROC={m[1]:.4f}, AUPR={m[2]:.4f}, "
                  f"Test: AUROC={m[3]:.4f}, AUPR={m[4]:.4f}  "
                  f"[mean over {n_folds} folds]")

    elapsed = time.perf_counter() - t0
    for lg in loggers:
        if lg:
            lg.close()
    if any(save_dirs):
        from dream_gnn_tpu.train.checkpoint import save_pytree

        for i, (si, cv) in enumerate(items):
            if not save_dirs[si]:
                continue
            with open(os.path.join(save_dirs[si],
                                   f"best_metric{cv + 1}.csv"), "w") as f:
                f.write("iter,train_auroc,train_aupr,test_auroc,"
                        "test_aupr\n")
                f.write(f"{best[i]['iter']},{best[i]['train_auroc']:.4f},"
                        f"{best[i]['train_aupr']:.4f},"
                        f"{best[i]['auroc']:.4f},{best[i]['aupr']:.4f}\n")
            if cfg.save_model and best_params[i] is not None:
                save_pytree(os.path.join(
                    save_dirs[si], f"best_model_fold{cv + 1}.npz"),
                    best_params[i])

    ms_per_step = (1e3 * time_in_steps / steps_timed) if steps_timed else None
    if verbose and ms_per_step is not None:
        print(f"Protocol timing: {ms_per_step:.2f} ms/step "
              f"({n_seeds} seeds x {len(folds)} folds batched), "
              f"{elapsed:.1f} s total")

    results = [dict(best_auroc=best[i]["auroc"], best_aupr=best[i]["aupr"],
                    best_iter=best[i]["iter"], elapsed_s=elapsed,
                    best_params=best_params[i], model_cfg=model_cfg,
                    ms_per_step=ms_per_step)
               for i in range(n_folds)]
    nf = len(folds)
    return [results[si * nf:(si + 1) * nf]
            for si in range(n_seeds)], train_fns

"""Jitted training/eval step factories.

The reference's hot loop (train.py:249-300) does host-side graph
augmentation, a forward, a backward and an Adam step per iteration,
with host<->device ping-pong every iteration.  Here one compiled
``lax.scan`` runs a whole eval interval (default 250 steps) on device:
augment-as-masks -> dual-route forward -> loss -> grads -> Adam, with
the learning rate as a carried scalar so the host-side plateau
scheduler can adjust it between scans.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax

from dream_gnn_tpu.augment.masks import augment_inputs
from dream_gnn_tpu.config import ModelConfig, TrainConfig
from dream_gnn_tpu.model.dream_gnn import ModelInputs, forward
from dream_gnn_tpu.train.losses import total_loss
from dream_gnn_tpu.train.optim import make_optimizer
from dream_gnn_tpu.utils.metrics import (aupr, aupr_masked, auroc,
                                         auroc_masked)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    key: jax.Array
    lr: jax.Array          # scalar; host plateau scheduler rewrites it


def make_one_step(model_cfg: ModelConfig, train_cfg: TrainConfig, tx):
    """Pure single-iteration step (augment -> fwd -> grads -> Adam).

    Shared by the single-fold scan loop below and the fold-vmapped
    multi-chip path (sharding/partition.py).  ``edge_weight`` masks
    padded decoder edges when folds are stacked to a common budget.

    Grid decode mode: pred is the (n_drug, n_dis) logit grid; the BCE
    targets are the association grid (enc_graph.a1) weighted by the
    in-fold cell mask (enc_graph.mask) — identical math to the
    candidate edge list (same cells, same mean), no gathers.
    """
    augment = train_cfg.augment
    grid = model_cfg.decode_mode == "grid"

    def loss_fn(params, inputs: ModelInputs, labels, key, edge_masks,
                edge_weight):
        pred, drug_out, drug_sim_out, dis_out, dis_sim_out = forward(
            params, inputs, model_cfg, train=True, key=key,
            edge_masks=edge_masks)
        if grid:
            pred = pred.reshape(-1)
            labels = inputs.enc_graph.a1.reshape(-1)
            edge_weight = inputs.enc_graph.mask.reshape(-1)
        loss, rel = total_loss(
            pred, labels, drug_out, drug_sim_out, dis_out, dis_sim_out,
            beta=train_cfg.beta, smoothing=train_cfg.label_smoothing,
            weight=edge_weight)
        return loss, rel

    def one_step(state: TrainState, inputs: ModelInputs, labels,
                 edge_weight=None):
        key, k_aug, k_fwd = jax.random.split(state.key, 3)
        aug_inputs, edge_masks = augment_inputs(
            k_aug, inputs, augment, num_ratings=model_cfg.num_ratings)
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, aug_inputs, labels, k_fwd, edge_masks,
            edge_weight)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(
            state.params,
            jax.tree.map(lambda u: -state.lr * u, updates))
        return TrainState(params=params, opt_state=opt_state, key=key,
                          lr=state.lr), loss

    return one_step


def make_train_fns(model_cfg: ModelConfig, train_cfg: TrainConfig):
    """Build (init_state, run_steps, evaluate) for one dataset shape.

    All returned callables are jitted and take graph/feature inputs as
    arguments (not closures), so one compilation serves every fold and
    seed of a dataset.
    """
    tx = make_optimizer(train_cfg.train_grad_clip, train_cfg.weight_decay)

    def init_state(params, key, lr=None):
        return TrainState(
            params=params,
            opt_state=tx.init(params),
            key=key,
            lr=jnp.asarray(lr if lr is not None else train_cfg.train_lr,
                           jnp.float32))

    one_step = make_one_step(model_cfg, train_cfg, tx)

    @partial(jax.jit, static_argnames=("n_steps",), donate_argnums=(0,))
    def run_steps(state: TrainState, inputs: ModelInputs, labels,
                  n_steps: int, edge_weight=None):
        """Run ``n_steps`` training iterations in one compiled scan."""
        def body(carry, _):
            return one_step(carry, inputs, labels, edge_weight)

        state, losses = jax.lax.scan(body, state, length=n_steps)
        return state, losses

    grid = model_cfg.decode_mode == "grid"

    @jax.jit
    def evaluate(params, inputs: ModelInputs, labels, w=None):
        """Eval forward (dropout elided) + on-device AUROC/AUPR.

        Parity trap §7.3.1: the caller chooses ``inputs.enc_graph`` —
        test-set evaluation runs the encoder on the *test* encoder
        graph, exactly like evaluation.py:32-34 + train.py:203-204.
        ``w``: 1/0 validity weights for padded edge lists.  Grid mode
        ignores ``labels``/``w`` and scores the in-fold grid cells.
        """
        pred, *_ = forward(params, inputs, model_cfg, train=False)
        if grid:
            pred = pred.reshape(-1)
            labels = inputs.enc_graph.a1.reshape(-1)
            w = inputs.enc_graph.mask.reshape(-1)
        if w is None:
            return auroc(labels, pred), aupr(labels, pred), pred
        return (auroc_masked(labels, pred, w),
                aupr_masked(labels, pred, w), pred)

    @partial(jax.jit, static_argnames=("n_steps",), donate_argnums=(0,))
    def run_interval(state: TrainState, train_inputs: ModelInputs,
                     train_labels, test_inputs: ModelInputs, test_labels,
                     n_steps: int, train_w=None, test_w=None):
        """One eval interval as a SINGLE dispatch: n training steps +
        train-set eval + test-set eval.  Through a relayed TPU each
        dispatch costs hundreds of ms of latency; the reference-cadence
        protocol makes 72 evals per fold, so fusing the interval
        roughly triples end-to-end protocol throughput.

        ``train_w``/``test_w``: 1/0 validity weights for padded fold
        edge lists (weighted loss, masked metrics) — folds then share
        one compiled shape.
        """
        state, losses = jax.lax.scan(
            lambda c, _: one_step(c, train_inputs, train_labels, train_w),
            state, length=n_steps)
        tr_pred, *_ = forward(state.params, train_inputs, model_cfg,
                              train=False)
        te_pred, *_ = forward(state.params, test_inputs, model_cfg,
                              train=False)
        if grid:
            tr_pred = tr_pred.reshape(-1)
            train_labels = train_inputs.enc_graph.a1.reshape(-1)
            train_w = train_inputs.enc_graph.mask.reshape(-1)
            te_pred = te_pred.reshape(-1)
            test_labels = test_inputs.enc_graph.a1.reshape(-1)
            test_w = test_inputs.enc_graph.mask.reshape(-1)

        def _roc(y, p, w):
            return auroc(y, p) if w is None else auroc_masked(y, p, w)

        def _pr(y, p, w):
            return aupr(y, p) if w is None else aupr_masked(y, p, w)

        metrics = (losses[-1],
                   _roc(train_labels, tr_pred, train_w),
                   _pr(train_labels, tr_pred, train_w),
                   _roc(test_labels, te_pred, test_w),
                   _pr(test_labels, te_pred, test_w))
        return state, metrics

    return init_state, run_steps, evaluate, run_interval

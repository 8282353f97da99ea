"""Per-fold training loop (reference ``train()``, train.py:154-395).

Differences from the reference, by design:
- the whole eval interval (250 iterations) runs as ONE compiled scan on
  device — no host work inside the hot loop;
- augmentation is in-graph masking (augment/masks.py);
- metrics are computed on device with sklearn-equivalent math.

Protocol parity kept: iteration count ``range(1, train_max_iter)``,
eval cadence, train-eval on the train encoder graph vs test-eval on the
test encoder graph (§7.3.1), plateau LR on test AUPR, best-by-test-AUPR
selection, and the CSV logging contract.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Optional

import jax
import numpy as np

from dream_gnn_tpu.config import ModelConfig, TrainConfig
from dream_gnn_tpu.data.loader import DreamDataset
from dream_gnn_tpu.model.dream_gnn import ModelInputs, init_params
from dream_gnn_tpu.train.checkpoint import save_pytree
from dream_gnn_tpu.train.optim import PlateauScheduler
from dream_gnn_tpu.train.step import make_train_fns
from dream_gnn_tpu.utils.logging import MetricLogger


def derive_model_cfg(cfg: TrainConfig, dataset: DreamDataset) -> ModelConfig:
    """Wire data-dependent dims (reference train.py:172-179)."""
    return dataclasses.replace(
        cfg.model,
        src_in_units=dataset.drug_feat.shape[1],
        dst_in_units=dataset.dis_feat.shape[1],
        fdim_drug=dataset.n_drug,
        fdim_disease=dataset.n_dis)


def fold_inputs(dataset: DreamDataset, cv: int):
    """(train_inputs, test_eval_inputs, train_labels, test_labels)."""
    fold = dataset.fold(cv)
    common = dict(
        drug_graph=dataset.drug_graph,
        drug_sim_feat=dataset.drug_sim_feat,
        drug_feat=dataset.drug_feat,
        dis_graph=dataset.dis_graph,
        dis_sim_feat=dataset.dis_sim_feat,
        dis_feat=dataset.dis_feat,
        drug_feature_graph=dataset.drug_feature_graph,
        dis_feature_graph=dataset.dis_feature_graph)
    train_inputs = ModelInputs(
        enc_graph=fold.train_enc, dec_src=fold.train_src,
        dec_dst=fold.train_dst, **common)
    test_inputs = ModelInputs(
        enc_graph=fold.test_enc, dec_src=fold.test_src,
        dec_dst=fold.test_dst, **common)
    return train_inputs, test_inputs, fold.train_labels, fold.test_labels


def train_fold(dataset: DreamDataset, cv: int, cfg: TrainConfig,
               seed_key: jax.Array, *, save_dir: Optional[str] = None,
               save_id: int = 0, verbose: bool = True,
               train_fns=None, resume_from: Optional[str] = None):
    """Train one fold; returns a result dict with best metrics.

    ``train_fns`` may carry the (init_state, run_steps, evaluate)
    triple from a previous fold so compiled steps are reused across
    folds/seeds (the shapes match; the reference instead re-runs Python
    for every fold).  ``resume_from`` restores a full TrainState
    checkpoint (params + optimiser + PRNG + lr) written by the periodic
    checkpointing below — the reference can only save final params,
    never resume (train.py:342-351).
    """
    model_cfg = derive_model_cfg(cfg, dataset)
    train_inputs, test_inputs, train_labels, test_labels = fold_inputs(
        dataset, cv)
    fold_data = dataset.fold(cv)
    return train_on_inputs(
        model_cfg, cfg, train_inputs, test_inputs, train_labels,
        test_labels, fold_data.train_w, fold_data.test_w, seed_key,
        save_dir=save_dir, save_id=save_id, verbose=verbose,
        train_fns=train_fns, resume_from=resume_from)


def train_on_inputs(model_cfg: ModelConfig, cfg: TrainConfig,
                    train_inputs: ModelInputs, test_inputs: ModelInputs,
                    train_labels, test_labels, train_w, test_w,
                    seed_key: jax.Array, *,
                    save_dir: Optional[str] = None, save_id: int = 0,
                    verbose: bool = True, train_fns=None,
                    resume_from: Optional[str] = None):
    """The fold-training core on EXPLICIT inputs — everything
    ``train_fold`` does (interval scans, plateau LR, best-by-test-AUPR,
    CSV contract, checkpoints, resume) without the DreamDataset
    coupling, so non-fold drivers (the 100k x 100k scale training run,
    scripts/train_scale.py) go through the standard harness instead of
    a parallel loop.  ``train_w``/``test_w`` weight BOTH the loss and
    the masked metrics — the scale path's slot-permuted decoder passes
    its slot weights here (padding slots at 0)."""
    if train_fns is None:
        train_fns = make_train_fns(model_cfg, cfg)
    init_state, run_steps, evaluate, run_interval = train_fns

    k_params, k_state = jax.random.split(seed_key)
    params = init_params(k_params, model_cfg)
    state = init_state(params, k_state)
    start_iter = 0
    plateau = PlateauScheduler(cfg.train_lr, patience=cfg.plateau_patience,
                               factor=cfg.plateau_factor)
    resumed_best = None
    resumed_best_params = None
    if resume_from:
        from dream_gnn_tpu.train.checkpoint import load_train_state

        # Restores the full TrainState AND the plateau scheduler —
        # otherwise the first post-resume eval clobbers the decayed lr —
        # AND the best-by-test-AUPR bookkeeping, so a best hit before
        # the preemption survives the restart.
        state, start_iter, extra = load_train_state(
            resume_from, state, plateau, with_extra=True)
        if extra and "best" in extra:
            resumed_best = {k: (int(v) if k == "iter" else float(v))
                            for k, v in extra["best"].items()}
            bp = extra.get("best_params") or None
            resumed_best_params = bp if bp else None

    logger = None
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
        logger = MetricLogger(
            ["iter", "loss", "train_auroc", "train_aupr",
             "test_auroc", "test_aupr"],
            ["%d", "%.4f", "%.4f", "%.4f", "%.4f", "%.4f"],
            os.path.join(save_dir, f"test_metric{save_id}.csv"),
            resume_iter=start_iter if resume_from else None)

    best = resumed_best or dict(aupr=-1.0, auroc=0.0, iter=0,
                                train_aupr=0.0, train_auroc=0.0)
    best_params = resumed_best_params
    total_iters = cfg.train_max_iter - 1      # range(1, max_iter)
    done = start_iter
    t0 = time.perf_counter()

    from dream_gnn_tpu.utils.profiling import StepTimer
    edges_per_step = 2.0 * float(
        np.asarray(train_inputs.enc_graph.mask).sum()
        * 2.0 * model_cfg.layers) if hasattr(
        train_inputs.enc_graph, "mask") else 0.0
    timer = StepTimer(edges_per_step)

    while done < total_iters:
        chunk = min(cfg.train_valid_interval, total_iters - done)
        timer.start()
        if chunk != cfg.train_valid_interval:
            # Trailing partial chunk: reference never evals there.
            state, losses = run_steps(state, train_inputs, train_labels,
                                      chunk, train_w)
            jax.block_until_ready(losses)
            timer.stop(chunk)
            done += chunk
            break
        # One fused dispatch: train chunk + train eval + test eval.
        state, metrics = run_interval(state, train_inputs, train_labels,
                                      test_inputs, test_labels, chunk,
                                      train_w, test_w)
        loss, tr_auroc, tr_aupr, te_auroc, te_aupr = [
            float(x) for x in jax.device_get(metrics)]
        timer.stop(chunk)
        done += chunk

        new_lr = plateau.step(te_aupr)
        if new_lr != float(state.lr):
            state = dataclasses.replace(
                state, lr=jax.numpy.asarray(new_lr, jax.numpy.float32))

        if logger:
            logger.log(iter=done, loss=loss, train_auroc=tr_auroc,
                       train_aupr=tr_aupr, test_auroc=te_auroc,
                       test_aupr=te_aupr)
        if verbose:
            print(f"Iter={done:5d}, Loss={loss:.4f}, "
                  f"Train: AUROC={tr_auroc:.4f}, AUPR={tr_aupr:.4f}, "
                  f"Test: AUROC={te_auroc:.4f}, AUPR={te_aupr:.4f}")

        if te_aupr > best["aupr"]:
            best = dict(aupr=te_aupr, auroc=te_auroc, iter=done,
                        train_aupr=tr_aupr, train_auroc=tr_auroc)
            if cfg.save_model:
                best_params = jax.tree.map(np.asarray, state.params)

        if cfg.checkpoint_every and save_dir \
                and done % cfg.checkpoint_every == 0:
            from dream_gnn_tpu.train.checkpoint import save_train_state
            save_train_state(
                os.path.join(save_dir, f"ckpt_fold{save_id}.npz"),
                state, done, plateau,
                extra={"best": {k: np.asarray(v) for k, v in best.items()},
                       "best_params": best_params or {}})

    elapsed = time.perf_counter() - t0
    if logger:
        logger.close()
    if save_dir:
        with open(os.path.join(save_dir, f"best_metric{save_id}.csv"),
                  "w") as f:
            f.write("iter,train_auroc,train_aupr,test_auroc,test_aupr\n")
            f.write(f"{best['iter']},{best['train_auroc']:.4f},"
                    f"{best['train_aupr']:.4f},{best['auroc']:.4f},"
                    f"{best['aupr']:.4f}\n")
        if cfg.save_model and best_params is not None:
            save_pytree(os.path.join(save_dir,
                                     f"best_model_fold{save_id}.npz"),
                        best_params)

    if verbose and timer.ms_per_step is not None:
        eps = timer.edges_per_s
        print(f"Fold timing: {timer.ms_per_step:.2f} ms/step"
              + (f", {eps:.3e} edges/s" if eps else ""))

    return dict(best_auroc=best["auroc"], best_aupr=best["aupr"],
                best_iter=best["iter"], elapsed_s=elapsed,
                final_state=state, best_params=best_params,
                train_fns=train_fns, model_cfg=model_cfg,
                ms_per_step=timer.ms_per_step,
                edges_per_s=timer.edges_per_s)

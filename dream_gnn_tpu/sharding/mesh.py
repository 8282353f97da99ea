"""Device mesh construction.

The reference has no parallelism of any kind (single ``args.device``,
sequential folds/seeds — SURVEY.md §2.C).  The TPU framework's two
mesh axes:

- ``dp``: fold/seed data parallelism — folds are independent training
  runs with identical shapes, so they vmap+shard cleanly;
- ``mp``: model/graph parallelism — the disease-node dimension of the
  bipartite grid (and the decoder edge dimension) is sharded, the
  drug-node dimension stays replicated; XLA inserts psum/all-gather
  over ICI for the cross-shard contractions.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh


def make_mesh(dp: Optional[int] = None, mp: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        dp = n // mp
    need = dp * mp
    if need > n:
        raise ValueError(f"mesh {dp}x{mp} needs {need} devices, have {n}")
    import numpy as np

    return Mesh(np.asarray(devices[:need]).reshape(dp, mp), ("dp", "mp"))

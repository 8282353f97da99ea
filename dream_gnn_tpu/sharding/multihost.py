"""Multi-host initialisation and mesh construction.

Single-host multi-chip uses sharding/mesh.py directly.  Across hosts,
JAX's distributed runtime provides the process group and XLA routes
collectives over ICI within a slice and DCN between slices — no custom
transport (the reference has no distributed support at all;
SURVEY.md §2.C).

Typical pod-slice usage:

    from dream_gnn_tpu.sharding import multihost
    multihost.initialize()               # reads TPU env on each host
    mesh = multihost.global_mesh(mp=4)   # dp spans hosts, mp intra-host

The edge partitioner (sharding/edge_partition.py) is rank-agnostic:
every host builds the full partition plan deterministically and
``jax.make_array_from_process_local_data`` places only the local
shards.
"""

from __future__ import annotations

from typing import Optional

import jax

from dream_gnn_tpu.sharding.mesh import make_mesh


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """``jax.distributed.initialize`` with TPU auto-detection.

    On Cloud TPU all arguments are discovered from the environment; pass
    them explicitly for other fabrics.  Safe to call once per process
    before any backend use.
    """
    import os

    # Do NOT touch jax.process_count()/devices() here: any backend use
    # initialises XLA and makes distributed.initialize() unusable.
    # Check the distributed client state directly instead.
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return  # already initialised
    multi_host_env = any(os.environ.get(v) for v in (
        "COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS",
        "JAX_COORDINATOR_ADDRESS")) or \
        "," in os.environ.get("TPU_WORKER_HOSTNAMES", "")
    if coordinator_address is None and not multi_host_env:
        # No multi-host environment configured (a single-entry
        # TPU_WORKER_HOSTNAMES means one host): tests and one-host
        # training keep the un-initialised default.
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id)


def global_mesh(mp: int = 1, dp: Optional[int] = None):
    """Mesh over ALL processes' devices: dp spans hosts (fold/seed data
    parallelism rides DCN; folds never communicate), mp stays within a
    host so the node-dimension collectives ride ICI."""
    devices = jax.devices()
    return make_mesh(dp=dp, mp=mp, devices=devices)


def local_shard_slice(global_len: int) -> slice:
    """The contiguous [start, stop) range of a length-``global_len``
    leading axis owned by this process (equal split)."""
    per = -(-global_len // jax.process_count())
    start = jax.process_index() * per
    return slice(start, min(start + per, global_len))

"""Param/state checkpointing.

The reference saves only the best model's state_dict
(``best_model_fold{id}.pth``, train.py:342-351) and never resumes.
Here checkpoints capture params + opt state + iteration so preempted
runs resume exactly (SURVEY.md §5: the TPU build's failure-recovery
story).  Format: a flat npz of leaves + a pickled treedef sidecar kept
inside one .npz for atomicity.
"""

from __future__ import annotations

import io
import pickle

import jax
import numpy as np


def save_pytree(path: str, tree) -> None:
    leaves, treedef = jax.tree.flatten(tree)
    buf = io.BytesIO()
    np.savez(buf, treedef=np.frombuffer(pickle.dumps(treedef), np.uint8),
             **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)})
    with open(path, "wb") as f:
        f.write(buf.getvalue())


def load_pytree(path: str):
    with np.load(path) as data:
        treedef = pickle.loads(data["treedef"].tobytes())
        leaves = [data[f"leaf_{i}"] for i in range(len(data.files) - 1)]
    return jax.tree.unflatten(treedef, leaves)


def save_train_state(path: str, state, step: int,
                     scheduler=None, extra=None) -> None:
    """Checkpoint a TrainState (params + opt state + PRNG key + lr)
    plus, when given, the host-side plateau scheduler's (lr, best,
    num_bad) — without it a resumed run would silently reset the LR
    schedule.  ``extra``: any additional pytree to restore alongside
    (best-by-AUPR bookkeeping, per-fold scheduler stacks, ...).

    PRNG keys are extended-dtype arrays; they are stored as raw key
    data plus the impl name and re-wrapped on load.

    The write is atomic (tmp file + rename) so a preemption mid-write
    never corrupts the previous checkpoint.
    """
    import os

    impl = str(jax.random.key_impl(state.key))
    sched = (np.asarray([scheduler.lr, scheduler.best,
                         float(scheduler.num_bad)])
             if scheduler is not None else np.zeros(0))
    tmp = path + ".tmp"
    save_pytree(tmp, {
        "params": state.params,
        "opt_state": state.opt_state,
        "lr": state.lr,
        "key_data": jax.random.key_data(state.key),
        "impl": np.frombuffer(impl.encode(), np.uint8),
        "step": np.asarray(step),
        "scheduler": sched,
        "extra": extra if extra is not None else {},
    })
    os.replace(tmp, path)


def load_train_state(path: str, template, scheduler=None,
                     with_extra: bool = False):
    """Restore (TrainState, step) from ``save_train_state`` output;
    also restores ``scheduler`` in place when it was checkpointed.
    With ``with_extra`` returns (state, step, extra).

    ``template`` supplies the dataclass type; leaves are replaced.
    """
    import dataclasses

    data = load_pytree(path)
    impl = bytes(data["impl"]).decode()
    key = jax.random.wrap_key_data(jax.numpy.asarray(data["key_data"]),
                                   impl=impl)
    state = dataclasses.replace(
        template,
        params=jax.tree.map(jax.numpy.asarray, data["params"]),
        opt_state=jax.tree.map(jax.numpy.asarray, data["opt_state"]),
        key=key,
        lr=jax.numpy.asarray(data["lr"]))
    sched = data.get("scheduler")
    if scheduler is not None and sched is not None and sched.size == 3:
        scheduler.lr = float(sched[0])
        scheduler.best = float(sched[1])
        scheduler.num_bad = int(sched[2])
    if with_extra:
        return state, int(data["step"]), data.get("extra", {})
    return state, int(data["step"])

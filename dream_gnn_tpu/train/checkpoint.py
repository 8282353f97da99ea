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

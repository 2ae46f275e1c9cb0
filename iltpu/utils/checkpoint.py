"""Checkpoint save/restore for arbitrary JAX pytrees.

The reference only saves final weights and has NO resume path anywhere
(SURVEY.md §5 checkpoint/resume); this module fills that gap: periodic
checkpoints of the full training state (params, optimiser states, replay,
PRNG key, step counter) and exact resume.

Format: one .npz of flattened leaves + a pickled treedef/aux header. Leaves
are pulled to host once per checkpoint; everything stays a pure function of
the passed state.
"""

import os
import pickle
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def save_checkpoint(path: str, state: Any, aux: Optional[Dict] = None):
    """Write `state` (any pytree) + small picklable `aux` dict to `path`
    (a directory)."""
    os.makedirs(path, exist_ok=True)
    leaves, treedef = jax.tree.flatten(state)
    host_leaves = [np.asarray(leaf) for leaf in leaves]
    np.savez(
        os.path.join(path, "leaves.npz"),
        **{f"leaf_{i}": leaf for i, leaf in enumerate(host_leaves)},
    )
    with open(os.path.join(path, "header.pkl"), "wb") as f:
        pickle.dump({"treedef": treedef, "aux": aux or {}}, f)


def load_checkpoint(path: str) -> Tuple[Any, Dict]:
    """Returns (state, aux). Arrays come back as numpy; JAX re-devices them
    lazily on first use."""
    with open(os.path.join(path, "header.pkl"), "rb") as f:
        header = pickle.load(f)
    data = np.load(os.path.join(path, "leaves.npz"))
    leaves = [data[f"leaf_{i}"] for i in range(len(data.files))]
    state = jax.tree.unflatten(header["treedef"], leaves)
    return state, header["aux"]

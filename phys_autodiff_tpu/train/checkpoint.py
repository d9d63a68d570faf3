"""Checkpoint save/restore for training state.

New capability relative to the reference, which keeps weights in in-memory
vectors regenerated from seeds each run (include/mlp_grid.h:19-24, survey
§5 "Checkpoint / resume: absent"). Two formats:

  * npz: dependency-free, a flat .npz of leaves + a JSON tree manifest —
    robust and human-inspectable (the default).
  * orbax: standard JAX ecosystem checkpointing, used when available.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(tree: Any):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return leaves, treedef


def save_npz(path: str, tree: Any) -> None:
    """Save any pytree (TrainState, params dict, ...) to <path>.npz +
    <path>.tree.json."""
    leaves, treedef = _flatten(tree)
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    np.savez(
        path if path.endswith(".npz") else path + ".npz",
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
    )
    manifest = path[: -len(".npz")] if path.endswith(".npz") else path
    with open(manifest + ".tree.json", "w") as f:
        json.dump({"treedef": str(treedef), "n_leaves": len(leaves)}, f)


def restore_npz(path: str, like: Any) -> Any:
    """Restore into the structure of `like` (a pytree with the same shape)."""
    npz_path = path if path.endswith(".npz") else path + ".npz"
    data = np.load(npz_path)
    _, treedef = _flatten(like)
    leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(len(data.files))]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_orbax(path: str, tree: Any) -> None:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), tree)
    ckptr.wait_until_finished()


def restore_orbax(path: str, like: Any) -> Any:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), like)

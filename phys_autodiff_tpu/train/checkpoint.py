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
    <path>.tree.json. Writes are atomic (temp file + os.replace), so a crash
    mid-save never leaves a corrupt .npz next to a stale manifest."""
    leaves, treedef = _flatten(tree)
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    npz_path = path if path.endswith(".npz") else path + ".npz"
    tmp = npz_path + ".tmp.npz"
    np.savez(tmp, **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)})
    os.replace(tmp, npz_path)
    manifest = npz_path[: -len(".npz")] + ".tree.json"
    tmp_manifest = manifest + ".tmp"
    with open(tmp_manifest, "w") as f:
        json.dump({"treedef": str(treedef), "n_leaves": len(leaves)}, f)
    os.replace(tmp_manifest, manifest)


def restore_npz(path: str, like: Any) -> Any:
    """Restore into the structure of `like` (a pytree with the same shape).

    The saved .tree.json manifest is validated against `like` (leaf count
    and treedef string) so a structurally different `like` cannot silently
    mis-assign leaves by index."""
    npz_path = path if path.endswith(".npz") else path + ".npz"
    data = np.load(npz_path)
    leaves_like, treedef = _flatten(like)
    manifest = npz_path[: -len(".npz")] + ".tree.json"
    if os.path.exists(manifest):
        with open(manifest) as f:
            meta = json.load(f)
        if meta.get("n_leaves") != len(leaves_like):
            raise ValueError(
                f"checkpoint has {meta.get('n_leaves')} leaves but `like` has "
                f"{len(leaves_like)} — structure mismatch"
            )
        if meta.get("treedef") != str(treedef):
            raise ValueError(
                "checkpoint treedef does not match `like`:\n"
                f"  saved: {meta.get('treedef')}\n  like:  {treedef}"
            )
    if len(data.files) != len(leaves_like):
        raise ValueError(
            f"checkpoint stores {len(data.files)} leaves but `like` has "
            f"{len(leaves_like)}"
        )
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

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
    """Save any pytree (TrainState, params dict, ...) to <path>.npz (+ a
    human-readable <path>.tree.json sidecar). The manifest is EMBEDDED in
    the .npz itself, so the checkpoint is a single atomically-replaced
    file — a crash can never pair a new .npz with a stale manifest, and a
    copied-alone .npz keeps its structure validation."""
    leaves, treedef = _flatten(tree)
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    npz_path = path if path.endswith(".npz") else path + ".npz"
    meta = json.dumps({"treedef": str(treedef), "n_leaves": len(leaves)})
    tmp = npz_path + ".tmp.npz"
    np.savez(
        tmp,
        __manifest__=np.frombuffer(meta.encode(), dtype=np.uint8),
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
    )
    os.replace(tmp, npz_path)
    # non-authoritative human-readable sidecar
    manifest = npz_path[: -len(".npz")] + ".tree.json"
    tmp_manifest = manifest + ".tmp"
    with open(tmp_manifest, "w") as f:
        f.write(meta)
    os.replace(tmp_manifest, manifest)


def restore_npz(path: str, like: Any) -> Any:
    """Restore into the structure of `like` (a pytree with the same shape).

    The manifest (embedded in the .npz; legacy checkpoints fall back to the
    .tree.json sidecar) is validated against `like` (leaf count and treedef
    string) so a structurally different `like` cannot silently mis-assign
    leaves by index. A checkpoint with no manifest at all is refused."""
    npz_path = path if path.endswith(".npz") else path + ".npz"
    leaves_like, treedef = _flatten(like)
    sidecar = npz_path[: -len(".npz")] + ".tree.json"
    with np.load(npz_path) as data:
        if "__manifest__" in data.files:
            meta = json.loads(bytes(data["__manifest__"].tobytes()).decode())
        elif os.path.exists(sidecar):
            with open(sidecar) as f:
                meta = json.load(f)
        else:
            raise ValueError(
                f"checkpoint {npz_path} has no embedded manifest and no "
                f"{sidecar} sidecar — cannot validate the tree structure"
            )
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
        leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(len(leaves_like))]
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

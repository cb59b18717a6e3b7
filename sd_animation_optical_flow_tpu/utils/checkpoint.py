"""Native checkpoint save/load for framework pytrees.

The reference only consumes torch checkpoints (guided_ldm.py:228-241);
porting those is utils/port_weights.py. This module is the framework's
own format: a flat .npz of path-keyed arrays (portable, no pickle), plus
an orbax-backed variant for sharded/async checkpoints when orbax is
available (train states on a mesh).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

_SEP = "/"


def _flatten(tree) -> dict:
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        keys = []
        for p in path:
            if hasattr(p, "key"):
                keys.append(str(p.key))
            elif hasattr(p, "idx"):
                keys.append(str(p.idx))
            else:
                keys.append(str(p))
        out[_SEP.join(keys)] = np.asarray(leaf)
    return out


def save_pytree(path: str, tree: Any):
    """Save any pytree of arrays as a flat npz keyed by tree path."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **_flatten(tree))


def load_pytree(path: str, like: Any) -> Any:
    """Load into the structure of ``like`` (shapes/dtypes validated)."""
    data = np.load(path)
    flat = dict(data.items())
    leaves, treedef = jax.tree_util.tree_flatten(like)
    paths = [k for k, _ in jax.tree_util.tree_flatten_with_path(like)[0]]

    def key_of(path):
        keys = []
        for p in path:
            if hasattr(p, "key"):
                keys.append(str(p.key))
            elif hasattr(p, "idx"):
                keys.append(str(p.idx))
            else:
                keys.append(str(p))
        return _SEP.join(keys)

    new_leaves = []
    for path, leaf in zip(paths, leaves):
        k = key_of(path)
        if k not in flat:
            raise KeyError(f"checkpoint missing {k}")
        arr = flat[k]
        if tuple(arr.shape) != tuple(np.shape(leaf)):
            raise ValueError(
                f"{k}: shape {arr.shape} != expected {np.shape(leaf)}")
        new_leaves.append(jnp.asarray(arr, jnp.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def save_orbax(path: str, tree: Any):
    """Orbax checkpoint (sharded-aware); falls back to npz if absent."""
    try:
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path), tree, force=True)
        ckptr.wait_until_finished()
        return "orbax"
    except Exception:
        save_pytree(path + ".npz", tree)
        return "npz"


def restore_orbax(path: str, like: Any) -> Any:
    try:
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(os.path.abspath(path), like)
    except Exception:
        return load_pytree(path + ".npz", like)

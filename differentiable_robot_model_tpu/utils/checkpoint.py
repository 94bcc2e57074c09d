"""Checkpoint / restore for parameter pytrees and robot structs.

The reference has no save/load at all (SURVEY.md §5: checkpoint/resume
ABSENT; implicitly available via torch state_dict but never exercised).
Here: any pytree of arrays (learnable parameter sets, optimizer states,
whole RobotStructs' array leaves) round-trips through a single .npz file
with slash-joined key paths — dependency-free and host-portable; identified
parameters from a training run restore with `load_pytree` + `set_parameters`.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def _flatten(tree: Any):
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    flat = {}
    for path, leaf in leaves_with_paths:
        key = "/".join(_path_str(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _path_str(p) -> str:
    if hasattr(p, "key"):
        return str(p.key)
    if hasattr(p, "idx"):
        return str(p.idx)
    if hasattr(p, "name"):
        return str(p.name)
    return str(p)


def save_pytree(path: str, tree: Any) -> None:
    """Save a pytree of arrays to an .npz (keys are slash-joined paths)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **_flatten(tree))


def load_pytree(path: str, like: Any) -> Any:
    """Load arrays saved by save_pytree back into the structure of `like`."""
    with np.load(path) as data:
        flat = dict(data)
    leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(like)
    new_leaves = []
    for p, leaf in leaves_with_paths:
        key = "/".join(_path_str(x) for x in p)
        if key not in flat:
            raise KeyError(f"Checkpoint {path} is missing entry '{key}'")
        arr = flat[key]
        import jax.numpy as jnp

        new_leaves.append(jnp.asarray(arr, getattr(leaf, "dtype", arr.dtype)))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)

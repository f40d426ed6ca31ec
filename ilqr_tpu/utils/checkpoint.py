"""Checkpoint / resume for long-running batched or MPC solves.

The reference holds everything in locals (src/forward_pass.jl:154-176) —
there is nothing to checkpoint and no way to resume.  Here the solver state
is a plain pytree of arrays serialized to a numpy ``.npz`` (no extra
dependencies).

Format (v2): every leaf is stored under its NAMED pytree path
(``jax.tree_util.tree_flatten_with_path`` keystr, e.g. ``.xs`` or
``['plan'][0]``), so validation on load matches leaves BY NAME against the
template — robust across JAX versions (the v1 format validated against
``repr(PyTreeDef)``, which is not a stable serialization and drifted
between versions).  v1 checkpoints (``leaf_<i>`` keys) still load through
the legacy index-based path.
"""

from __future__ import annotations

import os
import warnings
from typing import Any

import jax
import numpy as np

_FORMAT_V2 = 2


def _path_leaves(tree: Any):
    """``[(keystr, leaf), ...]`` in deterministic flatten order."""

    paths, _treedef = jax.tree_util.tree_flatten_with_path(tree)
    return [(jax.tree_util.keystr(path), leaf) for path, leaf in paths]


def save_solver_state(path: str, state: Any) -> None:
    """Serialize an arbitrary pytree of arrays (e.g. a SolverResult, an MPC
    carry, or (xs, us, iteration)) to ``path`` (.npz), leaves keyed by
    their pytree path names."""

    named = _path_leaves(state)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(
        path,
        __format__=np.int64(_FORMAT_V2),
        **{f"path:{key}": np.asarray(leaf) for key, leaf in named},
    )


def load_solver_state(path: str, like: Any) -> Any:
    """Load a pytree saved by :func:`save_solver_state`.

    ``like`` provides the pytree structure (e.g. a freshly-initialized state
    of the same shape).  Leaves are matched by pytree PATH NAME; a missing
    path, an extra path, or a shape/dtype mismatch raises ``ValueError``
    with the offending path named — silent structure drift would otherwise
    mis-assign leaves.  v1 checkpoints (positional ``leaf_<i>`` keys) load
    through the legacy index-based validation.
    """

    data = np.load(path)
    if "__format__" not in data:
        return _load_v1(data, like)

    named_like = _path_leaves(like)
    _leaves, treedef = jax.tree.flatten(like)

    saved_keys = {k[len("path:"):] for k in data.files if k.startswith("path:")}
    like_keys = [key for key, _ in named_like]
    missing = [k for k in like_keys if k not in saved_keys]
    extra = sorted(saved_keys - set(like_keys))
    if missing or extra:
        raise ValueError(
            "checkpoint pytree paths do not match the template:\n"
            f"  missing from checkpoint: {missing}\n"
            f"  not in template:         {extra}")

    leaves = []
    for key, like_leaf in named_like:
        leaf = data[f"path:{key}"]
        like_shape = tuple(np.shape(like_leaf))
        like_dtype = np.asarray(like_leaf).dtype
        if tuple(leaf.shape) != like_shape or leaf.dtype != like_dtype:
            raise ValueError(
                f"checkpoint leaf {key!r} ({leaf.dtype}{tuple(leaf.shape)}) "
                f"does not match template ({like_dtype}{like_shape})")
        leaves.append(leaf)
    return jax.tree.unflatten(treedef, leaves)


def _load_v1(data, like: Any) -> Any:
    """Legacy loader for positional ``leaf_<i>`` checkpoints."""

    like_leaves, treedef = jax.tree.flatten(like)
    n = treedef.num_leaves
    missing = [i for i in range(n) if f"leaf_{i}" not in data]
    if missing:
        raise ValueError(f"checkpoint is missing leaves {missing} "
                         f"(expected {n} leaves)")

    saved_def = (bytes(data["__treedef__"]).decode()
                 if "__treedef__" in data else None)
    if saved_def is not None:
        saved_def = saved_def.strip('"')  # legacy JSON-quoted form
    repr_matches = (saved_def is None
                    or saved_def == repr(jax.tree_util.tree_structure(like)))

    leaves = []
    for i, like_leaf in enumerate(like_leaves):
        leaf = data[f"leaf_{i}"]
        like_shape = np.shape(like_leaf)
        like_dtype = np.asarray(like_leaf).dtype
        if tuple(leaf.shape) != tuple(like_shape) or leaf.dtype != like_dtype:
            msg = (
                f"checkpoint leaf {i} ({leaf.dtype}{tuple(leaf.shape)}) does "
                f"not match template ({like_dtype}{tuple(like_shape)})")
            if not repr_matches:
                msg += "\ncheckpoint pytree structure also differs"
            raise ValueError(msg)
        leaves.append(leaf)

    if not repr_matches:
        warnings.warn(
            "legacy v1 checkpoint with a stale treedef repr; accepting "
            "because every leaf shape and dtype matches (re-save to "
            "upgrade to the named-path format)", stacklevel=3)
    return jax.tree.unflatten(treedef, leaves)

"""Checkpoint / resume for long-running batched or MPC solves.

The reference holds everything in locals (src/forward_pass.jl:154-176) —
there is nothing to checkpoint and no way to resume.  Here the solver state
is a plain pytree of arrays serialized to a numpy ``.npz`` (no extra
dependencies).  The pytree structure is stored alongside the leaves and
validated on load, so restoring into a mismatched template raises instead
of silently mis-assigning leaves.
"""

from __future__ import annotations

import os
import warnings
from typing import Any

import jax
import numpy as np


def _treedef_repr(tree: Any) -> str:
    return repr(jax.tree_util.tree_structure(tree))


def save_solver_state(path: str, state: Any) -> None:
    """Serialize an arbitrary pytree of arrays (e.g. a SolverResult, an MPC
    carry, or (xs, us, iteration)) to ``path`` (.npz)."""

    leaves, _ = jax.tree.flatten(state)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(
        path,
        __treedef__=np.frombuffer(_treedef_repr(state).encode(), dtype=np.uint8),
        **{f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)},
    )


def load_solver_state(path: str, like: Any) -> Any:
    """Load a pytree saved by :func:`save_solver_state`.

    ``like`` provides the pytree structure (e.g. a freshly-initialized state
    of the same shape).  Raises ``ValueError`` if the checkpoint was written
    from a different pytree structure or with mismatched leaf shapes —
    a silent structure drift would otherwise mis-assign leaves.
    """

    data = np.load(path)
    like_leaves, treedef = jax.tree.flatten(like)

    n = treedef.num_leaves
    missing = [i for i in range(n) if f"leaf_{i}" not in data]
    if missing:
        raise ValueError(f"checkpoint is missing leaves {missing} "
                         f"(expected {n} leaves)")

    # PyTreeDef repr is not a stable serialization format (it changes across
    # JAX versions, and older checkpoints stored it JSON-quoted), so a repr
    # mismatch alone is not fatal: if every leaf's shape AND dtype still
    # matches the template the checkpoint is accepted with a warning; a repr
    # mismatch combined with any leaf mismatch raises.
    saved_def = bytes(data["__treedef__"]).decode() if "__treedef__" in data else None
    if saved_def is not None:
        saved_def = saved_def.strip('"')  # legacy JSON-quoted form
    repr_matches = saved_def is None or saved_def == _treedef_repr(like)

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
                msg += (
                    "\ncheckpoint pytree structure also differs:\n"
                    f"  saved:    {saved_def}\n  template: {_treedef_repr(like)}")
            raise ValueError(msg)
        leaves.append(leaf)

    if not repr_matches:
        warnings.warn(
            "checkpoint treedef repr differs from the template (stale repr "
            "format or JAX version change); accepting because every leaf "
            "shape and dtype matches", stacklevel=2)
    return jax.tree.unflatten(treedef, leaves)

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

    saved_def = bytes(data["__treedef__"]).decode() if "__treedef__" in data else None
    if saved_def is not None and saved_def != _treedef_repr(like):
        raise ValueError(
            "checkpoint pytree structure does not match the template:\n"
            f"  saved:    {saved_def}\n  template: {_treedef_repr(like)}")

    n = treedef.num_leaves
    missing = [i for i in range(n) if f"leaf_{i}" not in data]
    if missing:
        raise ValueError(f"checkpoint is missing leaves {missing} "
                         f"(expected {n} leaves)")
    leaves = []
    for i, like_leaf in enumerate(like_leaves):
        leaf = data[f"leaf_{i}"]
        like_shape = np.shape(like_leaf)
        if tuple(leaf.shape) != tuple(like_shape):
            raise ValueError(
                f"checkpoint leaf {i} shape {tuple(leaf.shape)} does not "
                f"match template shape {tuple(like_shape)}")
        leaves.append(leaf)
    return jax.tree.unflatten(treedef, leaves)

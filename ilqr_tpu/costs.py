"""Cost-function library.

The reference signals the intent of a reusable cost library in its dead
``src/cost_functions.jl`` (excluded from the module at src/iLQR.jl:9; it
builds a weighted workspace-distance final cost and a sum-squared-torque
running cost around a rigid-body model).  Here those builders — and the
diagonal-weighted quadratic forms used by the RBD example
(test/RBD_2_link_example/RBD_helper_functions.jl:85-116) — are first-class,
pure JAX, and composable.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax.numpy as jnp


def quadratic_tracking_cost(Q, R, target=None):
    """``l(x, u) = (target - x)^T Q (target - x) + u^T R u``.

    ``Q``/``R`` may be full matrices or 1-D arrays (interpreted diagonal) —
    the diagonal-weighted form of RBD_helper_functions.jl:85-103.
    """

    Q = jnp.asarray(Q)
    R = jnp.asarray(R)

    def apply(W, v):
        return v @ (W * v) if W.ndim == 1 else v @ W @ v

    def cost(x, u):
        dx = x if target is None else jnp.asarray(target) - x[: jnp.size(target)]
        return apply(Q, dx) + apply(R, u)

    return cost


def quadratic_final_cost(Q, target=None, weight: float = 1.0):
    """``phi(x) = weight * (target - x)^T Q (target - x)``
    (RBD_helper_functions.jl:106-116, terminal weight 1e5 in the example)."""

    Q = jnp.asarray(Q)

    def apply(W, v):
        return v @ (W * v) if W.ndim == 1 else v @ W @ v

    def final_cost(x):
        dx = x if target is None else jnp.asarray(target) - x[: jnp.size(target)]
        return weight * apply(Q, dx)

    return final_cost


def effort_cost(weight: float = 1.0):
    """``l(x, u) = weight * sum(u^2)`` — the reference's
    ``simple_immediate_cost`` (src/cost_functions.jl:34-54)."""

    def cost(x, u):
        return weight * jnp.sum(u ** 2)

    return cost


def workspace_target_final_cost(forward_kinematics: Callable, target,
                                weight: float = 1.0):
    """Weighted squared distance of a body point to a workspace target —
    the reference's ``simple_final_cost`` (src/cost_functions.jl:5-27), with
    the kinematics supplied as a differentiable JAX callable
    ``forward_kinematics(x) -> point [3] (or [2])``.
    """

    target = jnp.asarray(target)

    def final_cost(x):
        point = forward_kinematics(x)
        return weight * jnp.sum((point - target) ** 2)

    return final_cost


def add_costs(*costs: Callable):
    """Sum several running costs ``l(x, u)`` into one."""

    def cost(x, u):
        total = 0.0
        for c in costs:
            total = total + c(x, u)
        return total

    return cost

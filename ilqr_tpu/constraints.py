"""Control box constraints via smooth squashing.

The reference solver is unconstrained — URDF effort limits are parsed but
never enforced (SURVEY.md §2.2: test/urdf/2Dof_arm.urdf joint limits are
ignored by the solver).  This module adds the standard smooth-squashing
treatment as a *problem transform*, keeping the solver itself untouched
(and hence fully jit/vmap/shard-compatible): optimize over unbounded
pre-controls ``v`` with

    u = mid + half * tanh(v),   mid = (u_max + u_min)/2, half = (u_max - u_min)/2

so every iterate — including every line-search trial rollout — satisfies
``u_min < u < u_max`` strictly, by construction.  This composes with every
engine in the framework (per-scenario ``solve``, fused batch-last engine,
MPC driver, sharded solves) because the result is just another
``Problem``.

Typical use::

    base = make_two_link_problem()
    prob, to_u, to_v = box_constrained(base, u_min=-5.0, u_max=5.0)
    vs0 = to_v(us0)                      # map an initial guess into v-space
    result = solve(prob, xs0, vs0)
    us = to_u(result.us)                 # recover feasible torques
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Tuple

import jax.numpy as jnp

from ilqr_tpu.problem import Problem


def box_constrained(problem: Problem, u_min, u_max,
                    margin: float = 1e-6) -> Tuple[Problem, Callable, Callable]:
    """Wrap ``problem`` so controls are squashed into ``(u_min, u_max)``.

    ``u_min``/``u_max`` are scalars or ``[m]`` arrays.  Returns
    ``(squashed_problem, to_u, to_v)`` where ``to_u(v)`` maps pre-controls
    to feasible controls and ``to_v(u)`` is its inverse (controls are
    clipped ``margin`` inside the box first so the ``arctanh`` is finite —
    use it to convert initial guesses).

    The squashed problem's cost/dynamics are the originals composed with
    ``to_u``; analytic derivative hooks of the base problem are dropped
    (they quadratize in u-space) and autodiff picks up the chain rule
    through the squash exactly.
    """

    u_min = jnp.asarray(u_min)
    u_max = jnp.asarray(u_max)
    mid = 0.5 * (u_max + u_min)
    half = 0.5 * (u_max - u_min)

    def to_u(v):
        return mid + half * jnp.tanh(v)

    def to_v(u):
        span = jnp.where(half > 0, half, 1.0)
        z = jnp.clip((u - mid) / span, -1.0 + margin, 1.0 - margin)
        return jnp.arctanh(z)

    def dynamics(x, v):
        return problem.dynamics(x, to_u(v))

    def cost(x, v):
        return problem.cost(x, to_u(v))

    squashed = dataclasses.replace(
        problem,
        dynamics=dynamics,
        cost=cost,
        name=problem.name + "_box",
        dynamics_jacobians=None,
        cost_quadratization=None,
        final_cost_quadratization=problem.final_cost_quadratization,
    )
    return squashed, to_u, to_v

"""The problem contract: three pure callables.

Mirrors the reference's entire user-facing contract
(src/forward_pass.jl:113-144):

* ``dynamics(x, u) -> x_next`` — discrete step, ``x: [n]``, ``u: [m]``;
* ``cost(x, u) -> scalar`` — running cost at one step;
* ``final_cost(x) -> scalar`` — terminal cost.

All three must be pure JAX functions (jit/vmap/grad-safe).  Unlike the
reference, the running cost may depend on only one argument — JAX autodiff
returns exact zeros where ForwardDiff.jl errored (the caveat documented at
src/backward_pass.jl:61-70 does not apply here).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ilqr_tpu.precision import highest_precision


@dataclasses.dataclass(frozen=True)
class Problem:
    """An optimal-control problem: dynamics + running cost + terminal cost.

    Treated as static under jit (the callables are baked into the trace).
    ``state_dim``/``control_dim`` are optional metadata used by helpers.
    """

    dynamics: Callable  # (x[n], u[m]) -> x_next[n]
    cost: Callable      # (x[n], u[m]) -> scalar
    final_cost: Callable  # (x[n]) -> scalar
    state_dim: Optional[int] = None
    control_dim: Optional[int] = None
    name: str = "problem"
    # Optional analytic derivative overrides (framework extension — the
    # reference always differentiates on the fly).  When provided, the
    # solver uses these instead of autodiff; they must return exactly what
    # the corresponding ilqr_tpu.derivatives function would:
    #   dynamics_jacobians(x, u) -> (A [n,n], B [n,m])
    #   cost_quadratization(x, u) -> (q, qx [n], ru [m], Qxx [n,n],
    #                                 Pux [m,n], Ruu [m,m])
    #   final_cost_quadratization(x) -> (q, qx [n], Qxx [n,n])
    dynamics_jacobians: Optional[Callable] = None
    cost_quadratization: Optional[Callable] = None
    final_cost_quadratization: Optional[Callable] = None
    #   dynamics_hessians(x, u) -> Fzz [n, n+m, n+m] (z = (x, u)) — only
    #   consulted under ILQRConfig(ddp=True); autodiff otherwise.
    dynamics_hessians: Optional[Callable] = None

    def __hash__(self):
        return hash((id(self.dynamics), id(self.cost), id(self.final_cost),
                     id(self.dynamics_jacobians),
                     id(self.cost_quadratization),
                     id(self.final_cost_quadratization),
                     id(self.dynamics_hessians), self.name))


@highest_precision
def rollout(dynamics: Callable, x0: jax.Array, us: jax.Array) -> jax.Array:
    """Roll the dynamics forward from ``x0`` under open-loop controls ``us``.

    Returns the state trajectory ``[T+1, n]``.  The reference does this with
    a Python loop in its examples (test/2_link_example/animate_2_link.jl:14-16);
    here it is a ``lax.scan`` so it jits and vmaps.
    """

    def step(x, u):
        x_next = dynamics(x, u)
        return x_next, x_next

    _, xs = jax.lax.scan(step, x0, us)
    return jnp.concatenate([x0[None], xs], axis=0)


@highest_precision
def total_cost(problem: Problem, xs: jax.Array, us: jax.Array,
               x_ref: Optional[jax.Array] = None) -> jax.Array:
    """Total trajectory cost.

    Replicates src/forward_pass.jl:182-196 exactly: the running cost sees the
    state *offset by the reference trajectory* (``L(x_i - r_i, u_i)``,
    :190) while the terminal cost sees the raw final state (:192).  When
    ``x_ref`` is ``None`` the offset is zero (the reference's default,
    src/forward_pass.jl:151).
    """

    xs_run = xs[:-1]
    if x_ref is not None:
        xs_run = xs_run - x_ref[: xs_run.shape[0]]
    step_costs = jax.vmap(problem.cost)(xs_run, us)
    return jnp.sum(step_costs) + problem.final_cost(xs[-1])


def step_costs(problem: Problem, xs: jax.Array, us: jax.Array,
               x_ref: Optional[jax.Array] = None):
    """Per-timestep running costs ``[T]`` and terminal cost (scalar), with
    the same offset semantics as :func:`total_cost` — so
    ``total_cost == sum(steps) + final``.  Used by the high-resolution
    line-search acceptance (``config.exact_ls_delta``), which differences
    these per-step values instead of the rounded totals."""

    xs_run = xs[:-1]
    if x_ref is not None:
        xs_run = xs_run - x_ref[: xs_run.shape[0]]
    return jax.vmap(problem.cost)(xs_run, us), problem.final_cost(xs[-1])

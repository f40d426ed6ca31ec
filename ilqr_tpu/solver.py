"""Solver driver: the jitted outer loop, and a reference-compatible ``fit``.

Equivalent of the reference's ``fit`` (src/forward_pass.jl:148-179), as a
``lax.while_loop`` so the entire solve — derivatives, Riccati scan, rollout,
line search, convergence test — is one compiled XLA program that can be
``vmap``-ed over thousands of scenarios and sharded over a device mesh.

Replicated semantics:

* initial ``prev_cost = Inf`` (:154) so the first forward pass accepts
  alpha = 1 unconditionally on a cost decrease from infinity;
* convergence when ``sum((u_new - u)^2) <= tol`` (:171);
* on the converging iteration the reference ``break``s *before* adopting the
  new trajectory (:171 vs :174-175), returning the previous iterate — we
  match that under ``config.reference_return_semantics`` (default).

Framework extensions over the reference: bounded line search with a
``LINESEARCH_FAILED`` status instead of an infinite loop, optional adaptive
regularization, per-scenario status flags (a diverged solve in a batch is
data, not a crash), and iteration metrics.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ilqr_tpu.config import DEFAULT_CONFIG, ILQRConfig, Status
from ilqr_tpu.precision import highest_precision
from ilqr_tpu.problem import Problem, total_cost
from ilqr_tpu.step import (
    StepState,
    finalize_status,
    ilqr_step,
    initial_state,
    make_scalar_engine,
)


class SolverResult(NamedTuple):
    xs: jax.Array          # [T+1, n] solution state trajectory
    us: jax.Array          # [T, m] solution controls
    cost: jax.Array        # scalar: cost of (xs, us)
    iterations: jax.Array  # int32: backward/forward iterations performed
    status: jax.Array      # int32: ilqr_tpu.Status value
    reg: jax.Array         # final regularization (== config.reg unless adaptive)
    alpha: jax.Array       # last accepted step size
    du_sq: jax.Array       # last sum((u_new - u)^2) (convergence quantity)

    @property
    def converged(self):
        return self.status == int(Status.CONVERGED)


@highest_precision
def solve(problem: Problem, x_init: jax.Array, u_init: jax.Array,
          x_ref: Optional[jax.Array] = None,
          config: ILQRConfig = DEFAULT_CONFIG) -> SolverResult:
    """Solve the trajectory-optimization problem by iLQR.

    ``x_init: [T+1, n]`` is the full initial state trajectory (it is the
    linearization point for the first backward pass — the reference's API,
    src/forward_pass.jl:148; use :func:`ilqr_tpu.problem.rollout` to build
    one from an initial state).  ``u_init: [T, m]``.

    The iteration body is the shared :func:`ilqr_tpu.step.ilqr_step`; this
    driver only supplies the per-scenario engine and the early-exit
    ``lax.while_loop``.
    """

    dtype = x_init.dtype
    engine = make_scalar_engine(problem, x_ref, config)

    def cond(state: StepState):
        return jnp.logical_and(
            state.status == int(Status.RUNNING),
            state.iteration < config.max_iter,
        )

    def body(state: StepState) -> StepState:
        return ilqr_step(engine, config, state)[0]

    final = jax.lax.while_loop(cond, body, initial_state(x_init, u_init, config))

    status = finalize_status(final.status)
    cost = jnp.where(
        jnp.isinf(final.prev_cost),
        total_cost(problem, final.xs, final.us, x_ref).astype(dtype),
        final.prev_cost,
    )
    return SolverResult(
        xs=final.xs,
        us=final.us,
        cost=cost,
        iterations=final.iteration,
        status=status,
        reg=final.reg,
        alpha=final.alpha,
        du_sq=final.du_sq,
    )


def make_solver(problem: Problem, config: ILQRConfig = DEFAULT_CONFIG,
                with_ref: bool = False):
    """Return a jitted ``solve_fn(x_init, u_init[, x_ref]) -> SolverResult``.

    The problem and config are baked in as static; the returned function is
    safe to ``vmap``/``shard_map`` over leading batch dimensions of its
    array arguments.
    """

    if with_ref:
        @jax.jit
        def solve_fn(x_init, u_init, x_ref):
            return solve(problem, x_init, u_init, x_ref, config)
    else:
        @jax.jit
        def solve_fn(x_init, u_init):
            return solve(problem, x_init, u_init, None, config)

    return solve_fn


def fit(x_init, u_init, dynamicsf, immediate_cost, final_cost,
        x_traj=None, max_iter: int = 100, tol: float = 1e-6,
        config: Optional[ILQRConfig] = None):
    """Reference-compatible entry point.

    Mirrors ``iLQR.fit(x_init, u_init, dynamicsf, immediate_cost,
    final_cost; x_traj, max_iter, tol)`` (src/forward_pass.jl:148-152) and
    returns ``(xs, us)``.  ``x_traj`` defaults to zeros, as in the
    reference (:151).
    """

    problem = Problem(dynamics=dynamicsf, cost=immediate_cost,
                      final_cost=final_cost)
    cfg = (config or DEFAULT_CONFIG).replace(max_iter=int(max_iter), tol=float(tol))
    result = solve(problem, jnp.asarray(x_init), jnp.asarray(u_init),
                   x_ref=None if x_traj is None else jnp.asarray(x_traj),
                   config=cfg)
    return result.xs, result.us

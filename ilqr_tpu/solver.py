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

from ilqr_tpu.backward import backward_pass
from ilqr_tpu.config import DEFAULT_CONFIG, ILQRConfig, Status
from ilqr_tpu.forward import forward_pass
from ilqr_tpu.precision import highest_precision
from ilqr_tpu.problem import Problem, total_cost


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


class _LoopState(NamedTuple):
    xs: jax.Array
    us: jax.Array
    prev_cost: jax.Array
    iteration: jax.Array
    status: jax.Array
    reg: jax.Array
    alpha: jax.Array
    du_sq: jax.Array


@highest_precision
def solve(problem: Problem, x_init: jax.Array, u_init: jax.Array,
          x_ref: Optional[jax.Array] = None,
          config: ILQRConfig = DEFAULT_CONFIG) -> SolverResult:
    """Solve the trajectory-optimization problem by iLQR.

    ``x_init: [T+1, n]`` is the full initial state trajectory (it is the
    linearization point for the first backward pass — the reference's API,
    src/forward_pass.jl:148; use :func:`ilqr_tpu.problem.rollout` to build
    one from an initial state).  ``u_init: [T, m]``.
    """

    dtype = x_init.dtype

    def cond(state: _LoopState):
        return jnp.logical_and(
            state.status == int(Status.RUNNING),
            state.iteration < config.max_iter,
        )

    def body(state: _LoopState) -> _LoopState:
        bwd = backward_pass(problem, state.xs, state.us, config, reg=state.reg)
        # First-order stationarity: predicted linear decrease ~ 0.  A
        # stationary iterate has no improving alpha, so skip the line-search
        # ladder entirely rather than burning max_backtracks rollouts
        # proving it.
        if config.tol_grad > 0.0 or config.tol_grad_rel > 0.0:
            thresh = config.tol_grad + config.tol_grad_rel * jnp.where(
                jnp.isfinite(state.prev_cost), jnp.abs(state.prev_cost), 0.0)
            stationary = jnp.abs(bwd.dV1) <= thresh
        else:
            stationary = jnp.bool_(False)
        fwd = forward_pass(
            problem, state.xs, state.us, bwd.duffs, bwd.Ks,
            state.prev_cost, x_ref, config, active=~stationary,
        )

        du_sq = jnp.sum((fwd.us - state.us) ** 2)
        converged = jnp.logical_and(fwd.accepted, du_sq <= config.tol)
        converged = jnp.logical_or(converged, stationary)
        ls_failed = jnp.logical_and(~fwd.accepted, ~converged)

        if config.adaptive_reg:
            reg = jnp.where(
                ls_failed,
                jnp.minimum(state.reg * config.reg_scale, config.reg_max),
                jnp.maximum(state.reg / config.reg_scale, config.reg_min),
            )
        else:
            reg = state.reg

        # With adaptive regularization a failed line search is retried at
        # higher reg instead of terminating.
        if config.adaptive_reg:
            fatal_ls = jnp.logical_and(ls_failed, state.reg >= config.reg_max)
        else:
            fatal_ls = ls_failed
        status = jnp.where(
            converged,
            jnp.int32(int(Status.CONVERGED)),
            jnp.where(
                fatal_ls,
                jnp.int32(int(Status.LINESEARCH_FAILED)),
                jnp.int32(int(Status.RUNNING)),
            ),
        )

        # Adopt the new iterate unless the line search did not accept (the
        # candidate is then a rejected rollout) or the reference's return
        # semantics say to keep the pre-update iterate on convergence.
        keep_old = (~fwd.accepted) | (converged if config.reference_return_semantics
                                      else jnp.bool_(False))
        xs_next = jnp.where(keep_old, state.xs, fwd.xs)
        us_next = jnp.where(keep_old, state.us, fwd.us)
        prev_cost = jnp.where(fwd.accepted, fwd.cost, state.prev_cost)

        return _LoopState(
            xs=xs_next,
            us=us_next,
            prev_cost=prev_cost,
            iteration=state.iteration + 1,
            status=status,
            reg=reg,
            alpha=fwd.alpha,
            du_sq=du_sq,
        )

    init = _LoopState(
        xs=x_init,
        us=u_init,
        prev_cost=jnp.asarray(jnp.inf, dtype),
        iteration=jnp.int32(0),
        status=jnp.int32(int(Status.RUNNING)),
        reg=jnp.asarray(config.reg, dtype),
        alpha=jnp.asarray(config.alpha0, dtype),
        du_sq=jnp.asarray(jnp.inf, dtype),
    )
    final = jax.lax.while_loop(cond, body, init)

    status = jnp.where(
        final.status == int(Status.RUNNING),
        jnp.int32(int(Status.MAX_ITER)),
        final.status,
    )
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

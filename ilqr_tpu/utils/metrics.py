"""Structured per-iteration metrics.

The reference's entire observability story is two print statements
(src/forward_pass.jl:167 prints iteration/cost; :83-85 spams the line
search).  Here a fixed-shape ``lax.scan`` records a structured trace —
cost, step size, backtracks, convergence quantity, regularization, status —
for every iteration, device-side, with no host round-trips; it stays
jit/vmap-compatible so a batch of solves yields a batch of traces.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ilqr_tpu.backward import backward_pass
from ilqr_tpu.config import DEFAULT_CONFIG, ILQRConfig, Status
from ilqr_tpu.forward import forward_pass
from ilqr_tpu.precision import highest_precision
from ilqr_tpu.problem import Problem, total_cost
from ilqr_tpu.solver import SolverResult


class IterationTrace(NamedTuple):
    """Per-iteration metrics, each ``[max_iter]`` (padded after termination).

    ``valid`` marks rows belonging to iterations that actually ran.
    """

    cost: jax.Array
    alpha: jax.Array
    backtracks: jax.Array
    du_sq: jax.Array
    dV1: jax.Array
    reg: jax.Array
    status: jax.Array
    valid: jax.Array


@highest_precision
def solve_with_trace(problem: Problem, x_init: jax.Array, u_init: jax.Array,
                     x_ref: Optional[jax.Array] = None,
                     config: ILQRConfig = DEFAULT_CONFIG):
    """Like :func:`ilqr_tpu.solver.solve` but records an IterationTrace.

    Runs a fixed ``config.max_iter``-length scan with a ``done`` mask
    (fixed shapes → jit/vmap-friendly); prefer :func:`solve` when the trace
    is not needed and ``max_iter`` is large.
    """

    dtype = x_init.dtype

    def body(state, _):
        xs, us, prev_cost, status, reg = state
        running = status == int(Status.RUNNING)

        bwd = backward_pass(problem, xs, us, config, reg=reg)
        fwd = forward_pass(problem, xs, us, bwd.duffs, bwd.Ks,
                           prev_cost, x_ref, config)

        du_sq = jnp.sum((fwd.us - us) ** 2)
        converged = jnp.logical_and(fwd.accepted, du_sq <= config.tol)
        if config.tol_grad > 0.0:
            converged = jnp.logical_or(converged,
                                       jnp.abs(bwd.dV1) <= config.tol_grad)
        ls_failed = jnp.logical_and(~fwd.accepted, ~converged)

        if config.adaptive_reg:
            new_reg = jnp.where(
                ls_failed,
                jnp.minimum(reg * config.reg_scale, config.reg_max),
                jnp.maximum(reg / config.reg_scale, config.reg_min))
            fatal_ls = jnp.logical_and(ls_failed, reg >= config.reg_max)
        else:
            new_reg = reg
            fatal_ls = ls_failed

        new_status = jnp.where(
            converged, jnp.int32(int(Status.CONVERGED)),
            jnp.where(fatal_ls, jnp.int32(int(Status.LINESEARCH_FAILED)),
                      jnp.int32(int(Status.RUNNING))))

        keep_old = (~fwd.accepted) | (converged if config.reference_return_semantics
                                      else jnp.bool_(False))
        xs_next = jnp.where(keep_old, xs, fwd.xs)
        us_next = jnp.where(keep_old, us, fwd.us)
        cost_next = jnp.where(fwd.accepted, fwd.cost, prev_cost)

        # Freeze the state once no longer running.
        xs_out = jnp.where(running, xs_next, xs)
        us_out = jnp.where(running, us_next, us)
        cost_out = jnp.where(running, cost_next, prev_cost)
        status_out = jnp.where(running, new_status, status)
        reg_out = jnp.where(running, new_reg, reg)

        row = IterationTrace(
            cost=jnp.where(running, fwd.cost, jnp.asarray(jnp.nan, dtype)),
            alpha=fwd.alpha,
            backtracks=fwd.backtracks,
            du_sq=du_sq,
            dV1=bwd.dV1,
            reg=reg,
            status=status_out,
            valid=running,
        )
        return (xs_out, us_out, cost_out, status_out, reg_out), row

    init = (x_init, u_init, jnp.asarray(jnp.inf, dtype),
            jnp.int32(int(Status.RUNNING)), jnp.asarray(config.reg, dtype))
    (xs, us, cost, status, reg), trace = jax.lax.scan(
        body, init, None, length=config.max_iter)

    status = jnp.where(status == int(Status.RUNNING),
                       jnp.int32(int(Status.MAX_ITER)), status)
    iterations = jnp.sum(trace.valid.astype(jnp.int32))
    cost = jnp.where(jnp.isinf(cost),
                     total_cost(problem, xs, us, x_ref).astype(dtype), cost)
    result = SolverResult(
        xs=xs, us=us, cost=cost, iterations=iterations, status=status,
        reg=reg, alpha=trace.alpha[jnp.maximum(iterations - 1, 0)],
        du_sq=trace.du_sq[jnp.maximum(iterations - 1, 0)],
    )
    return result, trace

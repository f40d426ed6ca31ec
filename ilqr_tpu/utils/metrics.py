"""Structured per-iteration metrics.

The reference's entire observability story is two print statements
(src/forward_pass.jl:167 prints iteration/cost; :83-85 spams the line
search).  Here a fixed-shape ``lax.scan`` records a structured trace —
cost, step size, backtracks, convergence quantity, regularization, status —
for every iteration, device-side, with no host round-trips; it stays
jit/vmap-compatible so a batch of solves yields a batch of traces.

The iteration body is the shared :func:`ilqr_tpu.step.ilqr_step` — exactly
the body ``solver.solve`` runs — so the traced solver can never drift from
the plain one (it previously lost the ``tol_grad_rel`` test and the
stationary-lane ladder skip by duplicating the loop).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ilqr_tpu.config import DEFAULT_CONFIG, ILQRConfig
from ilqr_tpu.precision import highest_precision
from ilqr_tpu.problem import Problem, total_cost
from ilqr_tpu.solver import SolverResult
from ilqr_tpu.step import finalize_status, ilqr_step, initial_state, make_scalar_engine


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

    Runs a fixed ``config.max_iter``-length scan of the shared step (fixed
    shapes → jit/vmap-friendly); iterations after termination are frozen by
    the step's RUNNING mask and marked invalid.  Prefer :func:`solve` when
    the trace is not needed and ``max_iter`` is large.
    """

    dtype = x_init.dtype
    engine = make_scalar_engine(problem, x_ref, config)

    def body(state, _):
        new_state, aux = ilqr_step(engine, config, state)
        row = IterationTrace(
            cost=jnp.where(aux.valid, aux.cost, jnp.asarray(jnp.nan, dtype)),
            alpha=aux.alpha,
            backtracks=aux.backtracks,
            du_sq=aux.du_sq,
            dV1=aux.dV1,
            reg=aux.reg,
            status=aux.status,
            valid=aux.valid,
        )
        return new_state, row

    final, trace = jax.lax.scan(
        body, initial_state(x_init, u_init, config), None,
        length=config.max_iter)

    status = finalize_status(final.status)
    cost = jnp.where(jnp.isinf(final.prev_cost),
                     total_cost(problem, final.xs, final.us,
                                x_ref).astype(dtype),
                     final.prev_cost)
    result = SolverResult(
        xs=final.xs, us=final.us, cost=cost, iterations=final.iteration,
        status=status, reg=final.reg, alpha=final.alpha, du_sq=final.du_sq,
    )
    return result, trace

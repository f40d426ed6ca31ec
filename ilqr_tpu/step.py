"""The single shared iLQR iteration body.

One solver iteration — backward pass, stationarity gate, line-searched
forward pass, convergence/status bookkeeping, trajectory adoption — is the
same algorithm whether it runs per-scenario (``ilqr_tpu.solver.solve``),
batch-last fused (``ilqr_tpu.batched.batched_solve_fused``), or with a
recorded trace (``ilqr_tpu.utils.metrics.solve_with_trace``).  Those three
entry points previously hand-rolled the logic separately and drifted
(the traced solver lost the relative-gradient test and the stationary-lane
ladder skip).  They now all drive :func:`ilqr_step`; layout (scalar vs
batch-last lanes) and recording are engine/driver concerns, not algorithm
forks.

Semantics replicated from the reference ``fit`` loop
(src/forward_pass.jl:148-179):

* convergence when ``sum((u_new - u)^2) <= tol`` after an accepted step
  (:171);
* on the converging iteration the pre-update iterate is returned (the
  ``break`` at :171 runs before the update at :174-175) under
  ``config.reference_return_semantics``;
* a rejected line search leaves the iterate untouched.

Framework extensions (all default-off or masked per lane): stationarity
test ``|dV1| <= tol_grad + tol_grad_rel * |cost|`` that skips the
line-search ladder, adaptive Tikhonov regularization, per-lane Status.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ilqr_tpu.config import ILQRConfig, Status


class StepState(NamedTuple):
    """Solver loop carry.  Scalar per-lane fields are scalars in the
    per-scenario engine and ``[B]`` lane vectors in the batch-last engine;
    trajectories are ``[T+1, n]`` / ``[T, m]`` (batch-last: trailing ``B``)."""

    xs: jax.Array
    us: jax.Array
    prev_cost: jax.Array
    iteration: jax.Array  # int32: iterations this lane actually ran
    status: jax.Array     # int32 Status
    reg: jax.Array
    alpha: jax.Array
    du_sq: jax.Array


class StepAux(NamedTuple):
    """Per-iteration observables (the trace row of ``solve_with_trace``)."""

    cost: jax.Array        # candidate cost from the line search (inf if skipped)
    alpha: jax.Array
    backtracks: jax.Array
    du_sq: jax.Array
    dV1: jax.Array         # predicted linear decrease from the backward pass
    reg: jax.Array         # regularization used this iteration (pre-update)
    status: jax.Array      # status after this iteration
    valid: jax.Array       # bool: lane was RUNNING when the iteration started


class StepEngine(NamedTuple):
    """Layout-specific primitives the shared step body is written against.

    ``backward(xs, us, reg) -> (duffs, Ks, dV1, dV2)`` where
        ``dV1 = sum_t duff_t . Qu_t`` and
        ``dV2 = 0.5 sum_t duff_t . Quu_t duff_t`` (the expected cost
        change at step size alpha is ``alpha dV1 + alpha^2 dV2``);
    ``forward(xs, us, duffs, Ks, prev_cost, active, dV1, dV2)
        -> (xs, us, cost, accepted, alpha, backtracks)`` where ``accepted``
        must be False for lanes with ``active=False`` (``dV1``/``dV2``
        feed the optional expected-decrease acceptance test);
    ``du_sq(us_new, us_old) -> per-lane scalar``
    ``select(mask, new, old)`` — per-lane ``where`` for lane-shaped values;
    ``select_traj(mask, new, old)`` — ``where`` broadcast over a trajectory.
    """

    backward: Callable
    forward: Callable
    du_sq: Callable
    select: Callable
    select_traj: Callable


def ilqr_step(engine: StepEngine, config: ILQRConfig,
              state: StepState) -> tuple[StepState, StepAux]:
    """One iLQR iteration for every lane still RUNNING.

    Lanes not RUNNING are frozen: their state passes through unchanged and
    their ``aux.valid`` is False.  Pure function of the state — safe inside
    ``lax.while_loop`` (drivers that want early exit) and ``lax.scan``
    (drivers that want a fixed-shape trace).

    Composition of the two phase halves so pipelined drivers
    (:mod:`ilqr_tpu.parallel.pipeline`) can run them on different devices
    without forking the algorithm: :func:`ilqr_step` ==
    ``ilqr_step_apply(..., *ilqr_step_backward(...))``.
    """

    duffs, Ks, dV1, dV2 = ilqr_step_backward(engine, state)
    return ilqr_step_apply(engine, config, state, duffs, Ks, dV1, dV2)


def ilqr_step_backward(engine: StepEngine, state: StepState):
    """Phase 1: the backward Riccati pass on the current iterate.

    Returns ``(duffs, Ks, dV1, dV2)`` — everything the forward phase
    needs."""

    return engine.backward(state.xs, state.us, state.reg)


def ilqr_step_apply(engine: StepEngine, config: ILQRConfig,
                    state: StepState, duffs, Ks, dV1, dV2
                    ) -> tuple[StepState, StepAux]:
    """Phase 2: stationarity gate, line-searched forward pass, and all
    convergence/status bookkeeping, given phase 1's outputs for the SAME
    ``state``."""

    running = state.status == int(Status.RUNNING)

    # First-order stationarity: predicted linear decrease ~ 0.  A stationary
    # iterate has no improving alpha, so skip the line-search ladder rather
    # than burning max_backtracks rollouts proving it.
    if config.tol_grad > 0.0 or config.tol_grad_rel > 0.0:
        thresh = config.tol_grad + config.tol_grad_rel * jnp.where(
            jnp.isfinite(state.prev_cost), jnp.abs(state.prev_cost), 0.0)
        stationary = jnp.abs(dV1) <= thresh
    else:
        stationary = jnp.zeros_like(running)

    active = jnp.logical_and(running, ~stationary)
    if config.ls_alpha_warm_start:
        # One rung above the lane's last accepted alpha, capped at alpha0
        # (initial_state seeds state.alpha = alpha0, so iteration 1 is
        # unchanged; a failed ladder resets the carry below).
        alpha_init = jnp.minimum(
            jnp.asarray(config.alpha0, state.alpha.dtype),
            state.alpha / config.alpha_factor)
    else:
        alpha_init = None
    fxs, fus, fcost, accepted, falpha, fbts = engine.forward(
        state.xs, state.us, duffs, Ks, state.prev_cost, active, dV1, dV2,
        alpha_init)

    du_sq = engine.du_sq(fus, state.us)
    converged = jnp.logical_or(
        jnp.logical_and(accepted, du_sq <= config.tol), stationary)
    ls_failed = jnp.logical_and(~accepted, ~converged)

    if config.adaptive_reg:
        raise_reg = ls_failed
        if config.reg_backtrack_trigger > 0:
            # A step that only accepted deep in the ladder is a sign the
            # local model overshoots; steer reg up so the next step accepts
            # near alpha = 1 (Tassa et al. 2012 schedule).  Under the
            # warm-started ladder the backtrack count no longer encodes
            # depth (a crawling lane accepts at rung 0), so the trigger
            # tests the accepted alpha itself: bts >= t with an alpha0
            # start is exactly alpha <= alpha0 * factor^t (half-rung
            # tolerance keeps the discrete comparison robust).
            if config.ls_alpha_warm_start:
                alpha_thresh = config.alpha0 * (
                    config.alpha_factor
                    ** (config.reg_backtrack_trigger - 0.5))
                deep_accept = jnp.logical_and(accepted,
                                              falpha < alpha_thresh)
            else:
                deep_accept = fbts >= config.reg_backtrack_trigger
            raise_reg = jnp.logical_or(raise_reg, deep_accept)
        reg_new = jnp.where(
            raise_reg,
            jnp.minimum(state.reg * config.reg_scale, config.reg_max),
            jnp.maximum(state.reg / config.reg_scale, config.reg_min),
        )
        # A failed line search is retried at higher reg; it is only fatal
        # once the schedule is exhausted.
        fatal_ls = jnp.logical_and(ls_failed, state.reg >= config.reg_max)
    else:
        reg_new = state.reg
        fatal_ls = ls_failed

    status_new = jnp.where(
        converged,
        jnp.int32(int(Status.CONVERGED)),
        jnp.where(
            fatal_ls,
            jnp.int32(int(Status.LINESEARCH_FAILED)),
            jnp.int32(int(Status.RUNNING)),
        ),
    )

    # Adopt the candidate unless the line search rejected it, or the
    # reference's return semantics keep the pre-update iterate on the
    # converging iteration.
    keep_old = jnp.logical_or(
        ~accepted,
        converged if config.reference_return_semantics
        else jnp.zeros_like(converged))
    adopt = jnp.logical_and(running, ~keep_old)

    xs = engine.select_traj(adopt, fxs, state.xs)
    us = engine.select_traj(adopt, fus, state.us)
    prev_cost = engine.select(jnp.logical_and(running, accepted),
                              fcost, state.prev_cost)
    status = engine.select(running, status_new, state.status)
    reg = engine.select(running, reg_new, state.reg)
    if config.ls_alpha_warm_start:
        # Carry only ACCEPTED alphas; a failed ladder's exhausted alpha is
        # stale (reg just changed the local model) — restart at alpha0.
        alpha_carry = engine.select(
            accepted, falpha,
            jnp.full_like(falpha, config.alpha0))
    else:
        alpha_carry = falpha
    alpha = engine.select(running, alpha_carry, state.alpha)
    du_sq_out = engine.select(running, du_sq, state.du_sq)
    iteration = state.iteration + running.astype(jnp.int32)

    new_state = StepState(
        xs=xs, us=us, prev_cost=prev_cost, iteration=iteration,
        status=status, reg=reg, alpha=alpha, du_sq=du_sq_out,
    )
    aux = StepAux(
        cost=fcost, alpha=falpha, backtracks=fbts, du_sq=du_sq, dV1=dV1,
        reg=state.reg, status=status, valid=running,
    )
    return new_state, aux


def initial_state(xs, us, config: ILQRConfig, lane_shape=()) -> StepState:
    """The canonical loop init: infinite prev_cost (first forward pass
    accepts alpha=1 unconditionally, src/forward_pass.jl:154), RUNNING
    status, static initial reg."""

    dtype = xs.dtype
    return StepState(
        xs=xs,
        us=us,
        prev_cost=jnp.full(lane_shape, jnp.inf, dtype),
        iteration=jnp.zeros(lane_shape, jnp.int32),
        status=jnp.full(lane_shape, int(Status.RUNNING), jnp.int32),
        reg=jnp.full(lane_shape, config.reg, dtype),
        alpha=jnp.full(lane_shape, config.alpha0, dtype),
        du_sq=jnp.full(lane_shape, jnp.inf, dtype),
    )


def finalize_status(status):
    """Lanes still RUNNING when the loop ends hit the iteration cap."""

    return jnp.where(status == int(Status.RUNNING),
                     jnp.int32(int(Status.MAX_ITER)), status)


def make_scalar_engine(problem, x_ref, config: ILQRConfig) -> StepEngine:
    """The per-scenario engine (vmap-able leading batch axes)."""

    from ilqr_tpu.backward import backward_pass
    from ilqr_tpu.forward import forward_pass

    def backward(xs, us, reg):
        b = backward_pass(problem, xs, us, config, reg=reg)
        return b.duffs, b.Ks, b.dV1, b.dV2

    def forward(xs, us, duffs, Ks, prev_cost, active, dV1, dV2,
                alpha_init=None):
        f = forward_pass(problem, xs, us, duffs, Ks, prev_cost, x_ref,
                         config, active=active, dV1=dV1, dV2=dV2,
                         alpha_init=alpha_init)
        return f.xs, f.us, f.cost, f.accepted, f.alpha, f.backtracks

    return StepEngine(
        backward=backward,
        forward=forward,
        du_sq=lambda a, b: jnp.sum((a - b) ** 2),
        select=jnp.where,
        select_traj=jnp.where,
    )

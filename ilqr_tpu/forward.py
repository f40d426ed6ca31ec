"""Forward pass: fused scan rollout + bounded backtracking line search.

Reference behavior (src/forward_pass.jl:55-93) replicated exactly, made
jit/vmap-safe:

* closed-loop update ``u_new = u + alpha*duff + K (x_new - x)`` about the
  previous accepted trajectory (:72-73 — only the feedforward is scaled by
  alpha, standard iLQR);
* acceptance is raw cost decrease ``prev_cost - new_cost > 0`` (:79), no
  Armijo test — and since any comparison with NaN is false, NaN rollouts
  backtrack exactly as the reference's do;
* alpha ladder 1, 1/2, 1/4, … (:66,:82) trying alphas in that order and
  accepting the *first* improvement — but bounded at
  ``config.max_backtracks`` instead of the reference's unbounded
  ``while true`` (:70): exhaustion is reported, not an infinite loop.

Under ``vmap`` the ``lax.while_loop`` automatically becomes a masked batched
loop: scenarios that already accepted hold their result while stragglers
keep backtracking, which is the efficient TPU shape when most scenarios
accept alpha = 1.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ilqr_tpu.config import ILQRConfig, DEFAULT_CONFIG
from ilqr_tpu.ops import smallmat as sm
from ilqr_tpu.precision import highest_precision
from ilqr_tpu.problem import Problem, total_cost


class ForwardResult(NamedTuple):
    xs: jax.Array        # [T+1, n] accepted (or last tried) state trajectory
    us: jax.Array        # [T, m] accepted (or last tried) controls
    cost: jax.Array      # scalar cost of (xs, us)
    accepted: jax.Array  # bool: some alpha decreased the cost
    alpha: jax.Array     # the accepted step size
    backtracks: jax.Array  # int32: number of rejected alphas


@highest_precision
def closed_loop_rollout(problem: Problem, xs, us, duffs, Ks, alpha,
                        unroll: int = 1):
    """One closed-loop rollout ``[T]``-scan (src/forward_pass.jl:71-75)."""

    def step(x_new, inp):
        x_old, u_old, duff, K = inp
        u_new = u_old + alpha * duff + sm.mv(K, x_new - x_old)
        x_next = problem.dynamics(x_new, u_new)
        return x_next, (x_new, u_new)

    x0 = xs[0]
    x_last, (xs_new, us_new) = jax.lax.scan(
        step, x0, (xs[:-1], us, duffs, Ks), unroll=unroll)
    xs_new = jnp.concatenate([xs_new, x_last[None]], axis=0)
    return xs_new, us_new


@highest_precision
def forward_pass(problem: Problem, xs, us, duffs, Ks, prev_cost,
                 x_ref: Optional[jax.Array] = None,
                 config: ILQRConfig = DEFAULT_CONFIG,
                 active=None, dV1=None, dV2=None,
                 alpha_init=None) -> ForwardResult:
    """Line-searched forward pass.

    Equivalent of the reference's public ``forward_pass`` (:55) with the
    trajectory-offset total cost of src/forward_pass.jl:182-196.

    ``active`` (scalar bool, default True) gates the whole ladder: a solve
    already known to be first-order stationary (|dV1| <= tol_grad) has no
    improving alpha, so running the ladder would burn ``max_backtracks``
    full rollouts to prove it.  Inactive returns ``accepted=False`` with
    the inputs unchanged.

    ``dV1``/``dV2`` (the backward pass's expected-decrease coefficients:
    predicted cost change at step alpha is ``alpha dV1 + alpha^2 dV2``)
    feed the optional expected-decrease acceptance test
    (``config.ls_expected_decrease``, Tassa et al. 2012): a rung is
    accepted only if the ACHIEVED decrease is at least ``config.ls_c``
    of the predicted one, instead of the reference's any-decrease rule
    (src/forward_pass.jl:79).  On stiff problems any-decrease crawls at
    alpha ~ 2^-k forever; the ratio test rejects those rungs so the Tassa
    reg escalation kicks in and restores near-alpha=1 steps.
    """

    dtype = xs.dtype
    if active is None:
        active = jnp.bool_(True)
    use_expected = config.ls_expected_decrease and dV1 is not None

    if config.exact_ls_delta:
        from ilqr_tpu.problem import step_costs

        steps_old, final_old = step_costs(problem, xs, us, x_ref)

    def try_alpha(alpha):
        xs_new, us_new = closed_loop_rollout(problem, xs, us, duffs, Ks, alpha,
                                             unroll=config.scan_unroll)
        # Acceptance threshold on the achieved decrease: 0 for the
        # reference's any-decrease rule; ls_c * predicted decrease under
        # the expected-decrease test (predicted <= 0 falls back to
        # any-decrease — the quadratic model sees no descent direction).
        if use_expected:
            exp_impr = -(alpha * dV1 + alpha * alpha * dV2)
            thresh = config.ls_c * jnp.maximum(exp_impr, 0.0).astype(dtype)
        else:
            thresh = jnp.asarray(0.0, dtype)
        # Pin the cost to the trajectory dtype: model constants may live at
        # a higher precision (e.g. f64-under-x64 with f32 trajectories) and
        # would otherwise promote the while-loop carry.
        if config.exact_ls_delta:
            from ilqr_tpu.problem import step_costs

            steps_new, final_new = step_costs(problem, xs_new, us_new, x_ref)
            cost = (jnp.sum(steps_new) + final_new).astype(dtype)
            # Same condition as prev_cost - cost > 0, evaluated as a sum of
            # per-step differences (resolves decreases the rounded totals
            # cannot); first iteration (prev_cost = inf) always accepts.
            delta = (jnp.sum(steps_new - steps_old)
                     + (final_new - final_old)).astype(dtype)
            accept = jnp.logical_or(jnp.isinf(prev_cost),
                                    -delta > thresh)  # NaN delta → reject
            # Converging-step acceptance: at an f32 optimum the gain step
            # UNDERFLOWS the control update — u + alpha*duff + K dx == u
            # bitwise, so the rollout is identical and delta == 0 exactly.
            # Strict `delta < 0` would reject that lane forever, although
            # the f64 reference would accept the infinitesimal decrease
            # and certify sum((du)^2) <= tol on that very step
            # (src/forward_pass.jl:171).  Accept iff the candidate is
            # bitwise identical to the iterate (du_step_sq == 0; then
            # du_sq == 0 <= tol certifies convergence) — measured: all
            # 204/4096 strict-mode non-certified lanes end in exactly
            # this state (scripts/diag_strict.py, BENCH.md round 4).
            # delta is NOT consulted here: with identical controls the
            # re-rolled trajectory can differ by ulps (XLA fuses the
            # unrolled rollout differently than the one that produced
            # ``xs``), so delta is +/-1-ulp re-evaluation noise of a step
            # that was never taken.
            du_step_sq = jnp.sum((us_new - us) ** 2)
            accept = jnp.logical_or(accept, du_step_sq == 0)
            # Require a FINITE cost: a first-iteration rollout overflowing
            # to +inf must backtrack exactly as the rounded path's
            # inf - inf = NaN comparison rejects it (otherwise the accepted
            # inf re-arms the isinf(prev_cost) gate forever).
            accept = jnp.logical_and(accept, jnp.isfinite(cost))
        else:
            cost = total_cost(problem, xs_new, us_new, x_ref).astype(dtype)
            # False for NaN cost → backtrack; inf prev_cost → accept.
            accept = (prev_cost - cost) > thresh
        return xs_new, us_new, cost, accept

    def cond(carry):
        k, _alpha, accepted, *_ = carry
        return jnp.logical_and(active,
                               jnp.logical_and(~accepted,
                                               k < config.max_backtracks))

    def body(carry):
        k, alpha, _accepted, xs_c, us_c, _cost = carry
        xs_new, us_new, cost, accept = try_alpha(alpha)
        next_alpha = jnp.where(accept, alpha, alpha * config.alpha_factor)
        return (k + 1, next_alpha, accept, xs_new, us_new, cost)

    init = (
        jnp.int32(0),
        # alpha_init: per-lane warm-started first rung
        # (config.ls_alpha_warm_start; None = the reference's alpha0).
        (jnp.asarray(config.alpha0, dtype) if alpha_init is None
         else alpha_init.astype(dtype)),
        jnp.bool_(False),
        xs,
        us,
        jnp.asarray(jnp.inf, dtype),
    )
    k, alpha, accepted, xs_out, us_out, cost = jax.lax.while_loop(cond, body, init)
    # backtracks = number of *rejected* alphas: k-1 on acceptance (the k-th
    # try succeeded), k on exhaustion (every try failed), and 0 — not -1 —
    # when the ladder was skipped entirely (active=False, k=0).
    backtracks = jnp.where(accepted, jnp.maximum(k - 1, 0), k)
    return ForwardResult(
        xs=xs_out,
        us=us_out,
        cost=cost,
        accepted=accepted,
        alpha=alpha,
        backtracks=backtracks,
    )

"""Augmented-Lagrangian iLQR: general state/control inequality and
equality constraints.

The reference has no constraint handling at all — it parses URDF
effort/velocity limits (test/urdf/2Dof_arm.urdf) and then never enforces
them; its iLQR is unconstrained (SURVEY.md §2.2).  `constraints.
box_constrained` covers control boxes by smooth squashing; this module is
the general mechanism: an augmented-Lagrangian outer loop (the AL-iLQR /
ALTRO scheme) around the unmodified inner solver.

Formulation.  Per-step constraints ``c(x, u) -> [p]`` with convention
``c <= 0`` feasible (inequality rows) or ``c == 0`` (equality rows), plus
optional terminal ``c_T(x) -> [pT]``.  The inner solve minimizes

    L_AL(x, u) = L(x, u) + lam' c + 1/2 mu * sum_i a_i(c, lam) c_i^2

where ``a_i = 1`` for equality rows and for inequality rows with
``c_i >= 0 or lam_i > 0`` (the active set), else 0.  After each inner
solve the multipliers take a projected dual-ascent step
``lam <- max(0, lam + mu c)`` (inequalities; unprojected for equalities)
and the penalty escalates ``mu <- min(beta mu, mu_max)`` while the maximum
violation has not met its target decrease.

TPU-native mechanics: the step index is carried as a trailing state
coordinate (so the per-step multipliers ``lam [T, p]`` are gathered inside
the vmapped cost with zero derivative — the index direction is
uncontrollable and adds one benign state dimension), the outer loop is a
fixed-length ``lax.scan`` carrying ``(lam, mu, trajectory)``, and the
whole thing jits end-to-end and vmaps over scenario batches like the
unconstrained solver.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ilqr_tpu.config import DEFAULT_CONFIG, ILQRConfig, Status
from ilqr_tpu.precision import highest_precision
from ilqr_tpu.problem import Problem, rollout, total_cost
from ilqr_tpu.solver import solve


@dataclasses.dataclass(frozen=True)
class ALConfig:
    """Outer-loop configuration (frozen, jit-static)."""

    max_outer: int = 10
    mu0: float = 1.0
    mu_scale: float = 10.0
    mu_max: float = 1e8
    constraint_tol: float = 1e-4
    # Escalate mu only when max violation did not shrink by this factor.
    viol_decrease: float = 0.25
    lam_max: float = 1e8


class ALResult(NamedTuple):
    xs: jax.Array              # [T+1, n] (un-augmented)
    us: jax.Array              # [T, m]
    cost: jax.Array            # original (unaugmented) trajectory cost
    max_violation: jax.Array   # max over steps/rows of constraint violation
    outer_iterations: jax.Array
    inner_iterations: jax.Array  # total inner iLQR iterations
    status: jax.Array          # Status.CONVERGED iff feasible + inner done
    lam: jax.Array             # [T, p] final running multipliers
    lam_T: jax.Array           # [pT] final terminal multipliers
    mu: jax.Array              # final penalty weight


def _violation(c, is_eq):
    """Per-row violation magnitude: |c| for equalities, max(c, 0) else."""

    return jnp.where(is_eq, jnp.abs(c), jnp.maximum(c, 0.0))


def _al_penalty(c, lam, mu, is_eq):
    """lam'c + (mu/2) * sum active c_i^2 (active set per docstring)."""

    active = jnp.where(is_eq, True, (c >= 0.0) | (lam > 0.0))
    quad = jnp.where(active, c * c, 0.0)
    return jnp.sum(lam * c) + 0.5 * mu * jnp.sum(quad)


def _augment_problem(problem: Problem, constraint, constraint_T,
                     lam, lam_T, mu, is_eq, is_eq_T, T: int) -> Problem:
    """The inner (unconstrained) problem over the index-augmented state
    ``[x; k]``.  ``lam [T, p]`` may be a tracer — the closure is traced
    inside the jitted outer loop, so new multipliers do NOT recompile."""

    def dynamics(xk, u):
        x, k = xk[:-1], xk[-1]
        return jnp.concatenate([problem.dynamics(x, u), (k + 1.0)[None]])

    def cost(xk, u):
        x, k = xk[:-1], xk[-1]
        idx = jnp.clip(k.astype(jnp.int32), 0, T - 1)
        c = constraint(x, u)
        return problem.cost(x, u) + _al_penalty(c, lam[idx], mu, is_eq)

    def final_cost(xk):
        x = xk[:-1]
        base = problem.final_cost(x)
        if constraint_T is None:
            return base
        cT = constraint_T(x)
        return base + _al_penalty(cT, lam_T, mu, is_eq_T)

    return Problem(dynamics=dynamics, cost=cost, final_cost=final_cost,
                   state_dim=(problem.state_dim + 1
                              if problem.state_dim is not None else None),
                   control_dim=problem.control_dim,
                   name=problem.name + "_al")


@highest_precision
def al_solve(problem: Problem, x0: jax.Array, u_init: jax.Array,
             constraint: Callable, constraint_T: Optional[Callable] = None,
             equality_mask=None, equality_mask_T=None,
             config: ILQRConfig = DEFAULT_CONFIG,
             al_config: ALConfig = ALConfig()) -> ALResult:
    """Solve ``min cost s.t. c(x_k, u_k) <= 0 (or == 0), c_T(x_N) <= 0``.

    ``x0 [n]`` is the initial STATE (not a trajectory — the inner
    trajectories are re-rolled from it each outer iteration);
    ``u_init [T, m]``.  ``equality_mask [p]`` (bool) marks equality rows of
    ``constraint``; default all-inequality.  Fully jittable; ``vmap`` over
    a leading batch axis of ``x0``/``u_init`` for scenario batches.
    """

    dtype = x0.dtype
    T, m = u_init.shape
    n = x0.shape[0]

    # Probe constraint dimensions (trace-time shapes).
    p = jax.eval_shape(constraint, jax.ShapeDtypeStruct((n,), dtype),
                       jax.ShapeDtypeStruct((m,), dtype)).shape[0]
    if constraint_T is not None:
        pT = jax.eval_shape(constraint_T,
                            jax.ShapeDtypeStruct((n,), dtype)).shape[0]
    else:
        pT = 1  # dummy row, never used

    is_eq = (jnp.zeros((p,), bool) if equality_mask is None
             else jnp.asarray(equality_mask))
    is_eq_T = (jnp.zeros((pT,), bool) if equality_mask_T is None
               else jnp.asarray(equality_mask_T))

    def constraint_values(xs, us):
        c = jax.vmap(constraint)(xs[:-1], us)          # [T, p]
        if constraint_T is not None:
            cT = constraint_T(xs[-1])                  # [pT]
        else:
            cT = jnp.full((pT,), -1.0, dtype)          # always satisfied
        return c, cT

    class Carry(NamedTuple):
        us: jax.Array
        lam: jax.Array
        lam_T: jax.Array
        mu: jax.Array
        prev_viol: jax.Array
        inner_iters: jax.Array
        inner_status: jax.Array
        done: jax.Array

    def outer_body(carry: Carry, _):
        prob_al = _augment_problem(problem, constraint, constraint_T,
                                   carry.lam, carry.lam_T, carry.mu,
                                   is_eq, is_eq_T, T)
        x0_aug = jnp.concatenate([x0, jnp.zeros((1,), dtype)])
        xs_aug = rollout(prob_al.dynamics, x0_aug, carry.us)
        res = solve(prob_al, xs_aug, carry.us, config=config)

        xs_new = res.xs[:, :-1]
        us_new = res.us
        c, cT = constraint_values(xs_new, us_new)
        viol = jnp.maximum(jnp.max(_violation(c, is_eq[None, :])),
                           jnp.max(_violation(cT, is_eq_T)))

        # Dual ascent (projected for inequality rows), then penalty update.
        lam_new = carry.lam + carry.mu * c
        lam_new = jnp.where(is_eq[None, :], lam_new,
                            jnp.maximum(lam_new, 0.0))
        lam_new = jnp.clip(lam_new, -al_config.lam_max, al_config.lam_max)
        lam_T_new = carry.lam_T + carry.mu * cT
        lam_T_new = jnp.where(is_eq_T, lam_T_new,
                              jnp.maximum(lam_T_new, 0.0))
        lam_T_new = jnp.clip(lam_T_new, -al_config.lam_max, al_config.lam_max)

        feasible = viol <= al_config.constraint_tol
        slow = viol > al_config.viol_decrease * carry.prev_viol
        mu_new = jnp.where(
            jnp.logical_and(~feasible, slow),
            jnp.minimum(carry.mu * al_config.mu_scale, al_config.mu_max),
            carry.mu)

        done_now = jnp.logical_and(
            feasible, res.status != int(Status.LINESEARCH_FAILED))

        # Freeze once done (fixed-length scan).
        upd = ~carry.done
        new = Carry(
            us=jnp.where(upd, us_new, carry.us),
            lam=jnp.where(upd, lam_new, carry.lam),
            lam_T=jnp.where(upd, lam_T_new, carry.lam_T),
            mu=jnp.where(upd, mu_new, carry.mu),
            prev_viol=jnp.where(upd, viol, carry.prev_viol),
            inner_iters=carry.inner_iters + jnp.where(upd, res.iterations, 0),
            inner_status=jnp.where(upd, res.status, carry.inner_status),
            done=jnp.logical_or(carry.done, done_now),
        )
        ran = upd.astype(jnp.int32)
        return new, ran

    init = Carry(
        us=u_init,
        lam=jnp.zeros((T, p), dtype),
        lam_T=jnp.zeros((pT,), dtype),
        mu=jnp.asarray(al_config.mu0, dtype),
        prev_viol=jnp.asarray(jnp.inf, dtype),
        inner_iters=jnp.int32(0),
        inner_status=jnp.int32(int(Status.RUNNING)),
        done=jnp.bool_(False),
    )
    final, ran = jax.lax.scan(outer_body, init, None,
                              length=al_config.max_outer)

    xs = rollout(problem.dynamics, x0, final.us)
    cost = total_cost(problem, xs, final.us)
    c, cT = constraint_values(xs, final.us)
    viol = jnp.maximum(jnp.max(_violation(c, is_eq[None, :])),
                       jnp.max(_violation(cT, is_eq_T)))
    status = jnp.where(
        viol <= al_config.constraint_tol,
        jnp.int32(int(Status.CONVERGED)),
        jnp.where(final.inner_status == int(Status.LINESEARCH_FAILED),
                  jnp.int32(int(Status.LINESEARCH_FAILED)),
                  jnp.int32(int(Status.MAX_ITER))))

    return ALResult(
        xs=xs, us=final.us, cost=cost, max_violation=viol,
        outer_iterations=jnp.sum(ran), inner_iterations=final.inner_iters,
        status=status, lam=final.lam, lam_T=final.lam_T, mu=final.mu,
    )

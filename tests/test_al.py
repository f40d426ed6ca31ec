"""Augmented-Lagrangian constrained-solver tests.

The reference enforces no constraints (its URDF effort limits are parsed
and ignored); these pin the AL outer loop on problems with known behavior.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ilqr_tpu.al import ALConfig, ALResult, al_solve
from ilqr_tpu.config import ILQRConfig, Status
from ilqr_tpu.problem import Problem, rollout, total_cost
from ilqr_tpu.solver import solve


def _double_integrator(dt=0.1):
    A = jnp.asarray([[1.0, dt], [0.0, 1.0]])
    B = jnp.asarray([[0.5 * dt * dt], [dt]])
    return Problem(
        dynamics=lambda x, u: A @ x + B @ u,
        cost=lambda x, u: 0.01 * jnp.sum(u ** 2),
        final_cost=lambda x: 50.0 * jnp.sum((x - jnp.asarray([1.0, 0.0])) ** 2),
        state_dim=2, control_dim=1,
    )


def test_control_bound_is_enforced():
    """|u| <= u_max active constraint: the unconstrained optimum violates
    it; AL drives violation below tol and the bound is (near-)active."""

    problem = _double_integrator()
    T = 20
    x0 = jnp.zeros(2)
    us0 = jnp.zeros((T, 1))
    u_max = 0.8

    # Unconstrained: needs much larger u to hit the target fast.
    xs0 = rollout(problem.dynamics, x0, us0)
    unc = solve(problem, xs0, us0, config=ILQRConfig(max_iter=100, tol=1e-10))
    assert float(jnp.max(jnp.abs(unc.us))) > u_max

    def con(x, u):
        return jnp.concatenate([u - u_max, -u - u_max])  # [u-umax; -u-umax] <= 0

    res = al_solve(problem, x0, us0, con,
                   config=ILQRConfig(max_iter=100, tol=1e-10),
                   al_config=ALConfig(max_outer=12, constraint_tol=1e-4))
    assert int(res.status) == int(Status.CONVERGED), int(res.status)
    assert float(res.max_violation) <= 1e-4
    assert float(jnp.max(jnp.abs(res.us))) <= u_max + 1e-4
    # Constrained cost must be >= unconstrained cost.
    assert float(res.cost) >= float(unc.cost) - 1e-9


def test_state_constraint_velocity_cap():
    """State inequality v <= v_max that the unconstrained optimum violates."""

    problem = _double_integrator()
    T = 20
    x0 = jnp.zeros(2)
    us0 = jnp.zeros((T, 1))
    v_max = 0.5

    xs0 = rollout(problem.dynamics, x0, us0)
    unc = solve(problem, xs0, us0, config=ILQRConfig(max_iter=100, tol=1e-10))
    assert float(jnp.max(unc.xs[:, 1])) > v_max

    def con(x, u):
        return (x[1] - v_max)[None]

    res = al_solve(problem, x0, us0, con,
                   config=ILQRConfig(max_iter=100, tol=1e-10),
                   al_config=ALConfig(max_outer=15, constraint_tol=1e-4))
    assert int(res.status) == int(Status.CONVERGED)
    assert float(jnp.max(res.xs[:-1, 1])) <= v_max + 2e-4


def test_terminal_equality_constraint():
    """Terminal equality x_N == target reached to tolerance via lam_T."""

    dt = 0.1
    A = jnp.asarray([[1.0, dt], [0.0, 1.0]])
    B = jnp.asarray([[0.5 * dt * dt], [dt]])
    # NO terminal cost at all — only the equality constraint pulls x_N.
    problem = Problem(
        dynamics=lambda x, u: A @ x + B @ u,
        cost=lambda x, u: 0.1 * jnp.sum(u ** 2),
        final_cost=lambda x: jnp.zeros(()),
        state_dim=2, control_dim=1,
    )
    T = 20
    x0 = jnp.zeros(2)
    us0 = jnp.zeros((T, 1))
    target = jnp.asarray([0.7, 0.0])

    def con(x, u):
        return jnp.zeros((1,))  # no running constraint rows active

    def conT(x):
        return x - target

    res = al_solve(problem, x0, us0, con, constraint_T=conT,
                   equality_mask_T=jnp.asarray([True, True]),
                   config=ILQRConfig(max_iter=200, tol=1e-12),
                   al_config=ALConfig(max_outer=15, constraint_tol=1e-5,
                                      mu0=10.0))
    assert int(res.status) == int(Status.CONVERGED)
    np.testing.assert_allclose(np.asarray(res.xs[-1]), np.asarray(target),
                               atol=1e-4)


def test_al_agrees_with_squashed_box_constraints():
    """Torque-limited two-link swing-up: AL and the tanh-squashing transform
    are different mechanisms for the same feasible problem — both must land
    feasible with comparable cost."""

    from ilqr_tpu.constraints import box_constrained
    from ilqr_tpu.models.two_link import make_two_link_problem

    problem = make_two_link_problem()
    T = 60
    u_max = 3.0
    x0 = jnp.asarray([0.1, -0.1, 0.0, 0.0])
    us0 = jnp.zeros((T, 2))

    def con(x, u):
        return jnp.concatenate([u - u_max, -u - u_max])

    res = al_solve(problem, x0, us0, con,
                   config=ILQRConfig(max_iter=300, tol=1e-8),
                   al_config=ALConfig(max_outer=10, constraint_tol=1e-3))
    assert float(res.max_violation) <= 1e-3
    assert float(jnp.max(jnp.abs(res.us))) <= u_max + 1e-3

    sq_problem, to_u, to_v = box_constrained(problem, -u_max, u_max)
    vs0 = to_v(us0 * 0.0 + 1e-3)
    xs0 = rollout(sq_problem.dynamics, x0, vs0)
    sq = solve(sq_problem, xs0, vs0, config=ILQRConfig(max_iter=300, tol=1e-8))
    sq_us = to_u(sq.us)
    sq_xs = rollout(problem.dynamics, x0, sq_us)
    sq_cost = total_cost(problem, sq_xs, sq_us)

    # Same ballpark (squashing biases strictly inside the box).
    assert float(res.cost) <= float(sq_cost) * 1.1 + 1e-6


def test_al_solve_is_jit_and_vmap_safe():
    problem = _double_integrator()
    T = 10
    us0 = jnp.zeros((T, 1))

    def con(x, u):
        return jnp.concatenate([u - 0.8, -u - 0.8])

    cfg = ILQRConfig(max_iter=50, tol=1e-10)
    acfg = ALConfig(max_outer=10, mu0=10.0)
    f = jax.jit(lambda x0, us: al_solve(problem, x0, us, con,
                                        config=cfg, al_config=acfg))
    x0s = jnp.asarray([[0.0, 0.0], [0.2, -0.1], [-0.3, 0.0]])
    batch = jax.vmap(f, in_axes=(0, None))(x0s, us0)
    assert batch.us.shape == (3, T, 1)
    assert np.all(np.asarray(batch.max_violation) <= 1e-3)
    # Lane 0 equals the unbatched solve exactly.
    single = f(x0s[0], us0)
    np.testing.assert_allclose(np.asarray(batch.us[0]),
                               np.asarray(single.us), atol=1e-12)

"""Forward-pass / line-search behavior tests."""

import jax.numpy as jnp
import numpy as np

from ilqr_tpu.config import ILQRConfig
from ilqr_tpu.forward import forward_pass
from ilqr_tpu.models.two_link import make_two_link_problem
from ilqr_tpu.problem import Problem, rollout, total_cost


def test_open_loop_rollout_matches_manual():
    problem = make_two_link_problem()
    x0 = jnp.asarray([0.1, -0.1, 0.0, 0.0])
    us = jnp.asarray(np.random.default_rng(0).standard_normal((10, 2)) * 0.1)
    xs = rollout(problem.dynamics, x0, us)
    x = x0
    for k in range(10):
        x = problem.dynamics(x, us[k])
        np.testing.assert_allclose(np.asarray(xs[k + 1]), np.asarray(x))


def test_alpha_one_accepted_against_inf_cost():
    """First fit iteration: prev_cost=Inf accepts alpha=1 unconditionally
    (reference: Inf - anything > 0)."""

    problem = make_two_link_problem()
    T = 10
    x0 = jnp.asarray([0.1, -0.1, 0.0, 0.0])
    us = jnp.zeros((T, 2))
    xs = rollout(problem.dynamics, x0, us)
    duffs = jnp.zeros((T, 2))
    Ks = jnp.zeros((T, 2, 4))
    res = forward_pass(problem, xs, us, duffs, Ks, jnp.inf)
    assert bool(res.accepted)
    assert float(res.alpha) == 1.0
    assert int(res.backtracks) == 0


def test_backtracking_halves_alpha():
    """If alpha=1 overshoots, alpha halves until the cost decreases —
    the reference's schedule (src/forward_pass.jl:79-86)."""

    problem = make_two_link_problem()
    T = 10
    x0 = jnp.asarray([0.1, -0.1, 0.0, 0.0])
    us = jnp.zeros((T, 2))
    xs = rollout(problem.dynamics, x0, us)
    prev_cost = total_cost(problem, xs, us)
    # A huge bogus feedforward: full step must overshoot.
    duffs = jnp.full((T, 2), 200.0)
    Ks = jnp.zeros((T, 2, 4))
    res = forward_pass(problem, xs, us, duffs, Ks, prev_cost)
    assert bool(res.accepted)
    assert float(res.alpha) < 1.0
    assert int(res.backtracks) >= 1
    assert float(res.cost) < float(prev_cost)


def test_nan_dynamics_backtracks_then_fails():
    """NaN costs are never accepted (NaN comparisons are false, matching the
    reference's accidental NaN handling) and the bounded ladder reports
    failure instead of looping forever."""

    def bad_dynamics(x, u):
        return x + u * jnp.nan

    problem = Problem(
        dynamics=bad_dynamics,
        cost=lambda x, u: jnp.sum(u**2) + jnp.sum(x**2),
        final_cost=lambda x: jnp.sum(x**2),
    )
    T = 5
    xs = jnp.ones((T + 1, 2))
    us = jnp.ones((T, 2))
    duffs = jnp.ones((T, 2))
    Ks = jnp.zeros((T, 2, 2))
    cfg = ILQRConfig(max_backtracks=8)
    res = forward_pass(problem, xs, us, duffs, Ks, jnp.asarray(100.0), config=cfg)
    assert not bool(res.accepted)
    # Every alpha in the ladder was rejected.
    assert int(res.backtracks) == 8


def test_feedback_term_not_scaled_by_alpha():
    """u_new = u + alpha*duff + K(x_new - x): only the feedforward scales
    with alpha (src/forward_pass.jl:73)."""

    # Linear dynamics so we can predict the rollout exactly.
    A = jnp.asarray([[1.0, 0.1], [0.0, 1.0]])
    B = jnp.asarray([[0.0], [1.0]])
    problem = Problem(
        dynamics=lambda x, u: A @ x + B @ u,
        cost=lambda x, u: jnp.sum(x**2) + jnp.sum(u**2),
        final_cost=lambda x: jnp.sum(x**2),
    )
    T = 3
    x0 = jnp.asarray([1.0, 0.0])
    us = jnp.zeros((T, 1))
    xs = rollout(problem.dynamics, x0, us)
    duffs = jnp.asarray([[0.3], [0.2], [0.1]])
    K = jnp.asarray([[-0.5, -0.4]])
    Ks = jnp.tile(K, (T, 1, 1))

    from ilqr_tpu.forward import closed_loop_rollout

    alpha = 0.25
    xs_new, us_new = closed_loop_rollout(problem, xs, us, duffs, Ks, alpha)
    # Manual replication.
    x = x0
    for k in range(T):
        u = us[k] + alpha * duffs[k] + Ks[k] @ (x - xs[k])
        np.testing.assert_allclose(np.asarray(us_new[k]), np.asarray(u), atol=1e-12)
        x = problem.dynamics(x, u)
        np.testing.assert_allclose(np.asarray(xs_new[k + 1]), np.asarray(x), atol=1e-12)

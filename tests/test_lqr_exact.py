"""iLQR on a linear-quadratic problem must match the exact Riccati solution.

With linear dynamics and quadratic costs, one backward/forward sweep of iLQR
(with zero regularization) *is* the finite-horizon discrete LQR solution —
the strongest closed-form unit test of the whole L1-L3 stack.
"""

import jax.numpy as jnp
import numpy as np

from ilqr_tpu.config import ILQRConfig, Status
from ilqr_tpu.problem import Problem, rollout
from ilqr_tpu.solver import solve


def make_lqr(n=4, m=2, seed=0):
    rng = np.random.default_rng(seed)
    A = np.eye(n) + 0.05 * rng.standard_normal((n, n))
    B = 0.1 * rng.standard_normal((n, m))
    Q = np.eye(n) * 1.0
    R = np.eye(m) * 0.1
    QN = np.eye(n) * 10.0
    return A, B, Q, R, QN


def exact_lqr_controls(A, B, Q, R, QN, x0, T):
    """Textbook finite-horizon discrete Riccati recursion (numpy)."""

    n, m = B.shape
    S = QN.copy()
    Ks = np.zeros((T, m, n))
    for t in range(T - 1, -1, -1):
        H = R + B.T @ S @ B
        G = B.T @ S @ A
        K = np.linalg.solve(H, G)
        S = Q + A.T @ S @ A - G.T @ K
        Ks[t] = K
    xs = np.zeros((T + 1, n)); xs[0] = x0
    us = np.zeros((T, m))
    for t in range(T):
        us[t] = -Ks[t] @ xs[t]
        xs[t + 1] = A @ xs[t] + B @ us[t]
    return xs, us


def test_ilqr_matches_exact_lqr():
    A, B, Q, R, QN = make_lqr()
    T = 30
    x0 = np.array([1.0, -0.5, 0.3, 0.8])

    Aj, Bj, Qj, Rj, QNj = map(jnp.asarray, (A, B, Q, R, QN))

    problem = Problem(
        dynamics=lambda x, u: Aj @ x + Bj @ u,
        cost=lambda x, u: 0.5 * x @ Qj @ x + 0.5 * u @ Rj @ u,
        final_cost=lambda x: 0.5 * x @ QNj @ x,
    )

    us0 = jnp.zeros((T, 2))
    xs0 = rollout(problem.dynamics, jnp.asarray(x0), us0)
    config = ILQRConfig(reg=0.0, tol=1e-18, tol_grad=1e-10, max_iter=10,
                        reference_return_semantics=False)
    result = solve(problem, xs0, us0, config=config)

    xs_ref, us_ref = exact_lqr_controls(A, B, Q, R, QN, x0, T)
    # The cost model is exactly quadratic: iteration 1 already lands on the
    # optimum, iteration 2 confirms convergence.
    assert int(result.iterations) <= 3
    assert int(result.status) == int(Status.CONVERGED)
    np.testing.assert_allclose(np.asarray(result.us), us_ref, atol=1e-8)
    np.testing.assert_allclose(np.asarray(result.xs), xs_ref, atol=1e-8)


def test_backward_pass_gains_match_riccati():
    """Feedback gains from backward_pass equal the exact LQR gains (reg=0)."""

    from ilqr_tpu.backward import backward_pass
    from ilqr_tpu.config import ILQRConfig

    A, B, Q, R, QN = make_lqr(seed=3)
    T = 12
    n, m = B.shape
    Aj, Bj, Qj, Rj, QNj = map(jnp.asarray, (A, B, Q, R, QN))
    problem = Problem(
        dynamics=lambda x, u: Aj @ x + Bj @ u,
        cost=lambda x, u: 0.5 * x @ Qj @ x + 0.5 * u @ Rj @ u,
        final_cost=lambda x: 0.5 * x @ QNj @ x,
    )
    rng = np.random.default_rng(5)
    xs = jnp.asarray(rng.standard_normal((T + 1, n)))
    us = jnp.asarray(rng.standard_normal((T, m)))

    res = backward_pass(problem, xs, us, ILQRConfig(reg=0.0))

    S = QN.copy()
    for t in range(T - 1, -1, -1):
        H = R + B.T @ S @ B
        G = B.T @ S @ A
        K = np.linalg.solve(H, G)
        np.testing.assert_allclose(np.asarray(res.Ks[t]), -K, atol=1e-8)
        S = Q + A.T @ S @ A - G.T @ K
        S = 0.5 * (S + S.T)

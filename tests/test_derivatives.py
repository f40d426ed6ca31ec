"""Derivative-layer tests: the linearization test the reference intended.

The reference's ``test/test_linearize_dynamics.jl`` meant to verify that the
linearized dynamics track the true dynamics along a trajectory but called a
batched API that never existed (its :10) — here that test exists and runs.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ilqr_tpu.derivatives import (
    linearize_dynamics,
    quadratize_final_cost,
    quadratize_running_cost,
)
from ilqr_tpu.models.two_link import (
    TwoLinkParams,
    inertia_matrix,
    inertia_matrix_grad,
    make_two_link_problem,
)
from ilqr_tpu.problem import rollout


def test_linearization_tracks_dynamics():
    problem = make_two_link_problem()
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal(4) * 0.1)
    us = jnp.asarray(rng.standard_normal((50, 2)) * 0.1)
    xs = rollout(problem.dynamics, x0, us)

    As, Bs = linearize_dynamics(problem.dynamics, xs[:-1], us)
    assert As.shape == (50, 4, 4) and Bs.shape == (50, 4, 2)

    # First-order prediction of a perturbed step matches to O(eps^2).
    eps = 1e-5
    dx = jnp.asarray(rng.standard_normal(4)) * eps
    du = jnp.asarray(rng.standard_normal(2)) * eps
    k = 7
    f = problem.dynamics
    true_step = f(xs[k] + dx, us[k] + du)
    pred_step = f(xs[k], us[k]) + As[k] @ dx + Bs[k] @ du
    assert jnp.max(jnp.abs(true_step - pred_step)) < 1e-8


def test_quadratization_exact_on_quadratic_cost():
    n, m = 3, 2
    rng = np.random.default_rng(1)
    Q = rng.standard_normal((n, n)); Q = Q @ Q.T
    R = rng.standard_normal((m, m)); R = R @ R.T
    P = rng.standard_normal((m, n))
    qv = rng.standard_normal(n)
    rv = rng.standard_normal(m)

    Qj, Rj, Pj, qj, rj = map(jnp.asarray, (Q, R, P, qv, rv))

    def cost(x, u):
        return (0.5 * x @ Qj @ x + 0.5 * u @ Rj @ u + u @ Pj @ x
                + qj @ x + rj @ u + 1.5)

    xs = jnp.asarray(rng.standard_normal((4, n)))
    us = jnp.asarray(rng.standard_normal((4, m)))
    q, qx, ru, Qxx, Pux, Ruu = quadratize_running_cost(cost, xs, us)

    for t in range(4):
        x, u = np.asarray(xs[t]), np.asarray(us[t])
        np.testing.assert_allclose(qx[t], Q @ x + P.T @ u + qv, atol=1e-10)
        np.testing.assert_allclose(ru[t], R @ u + P @ x + rv, atol=1e-10)
        np.testing.assert_allclose(Qxx[t], Q, atol=1e-10)
        np.testing.assert_allclose(Pux[t], P, atol=1e-10)
        np.testing.assert_allclose(Ruu[t], R, atol=1e-10)


def test_final_quadratization():
    def phi(x):
        return jnp.sum((x - 1.0) ** 2)

    x = jnp.asarray([0.5, 2.0, -1.0])
    q, qx, Qxx = quadratize_final_cost(phi, x)
    np.testing.assert_allclose(q, float(np.sum((np.asarray(x) - 1) ** 2)))
    np.testing.assert_allclose(qx, 2 * (np.asarray(x) - 1), atol=1e-12)
    np.testing.assert_allclose(Qxx, 2 * np.eye(3), atol=1e-12)


def test_inertia_matrix_grad_matches_jacfwd():
    """Closed-form dM/dtheta (used to keep the dynamics first-order under
    AD) against autodiff of the inertia matrix."""

    params = TwoLinkParams()
    rng = np.random.default_rng(5)
    for _ in range(3):
        theta = jnp.asarray(rng.standard_normal(2))
        dM_ad = jax.jacfwd(lambda th: inertia_matrix(params, th))(theta)
        dM_cf = inertia_matrix_grad(params, theta)
        np.testing.assert_allclose(np.asarray(dM_cf), np.asarray(dM_ad),
                                   atol=1e-12)


def test_two_link_analytic_quadratization_matches_autodiff():
    """The constant-Hessian hooks on the two-link Problem against the
    autodiff quadratization of the same cost callables."""

    p_a = make_two_link_problem()  # analytic hooks (default)
    p_d = make_two_link_problem(analytic_cost_derivatives=False)
    assert p_a.cost_quadratization is not None
    assert p_d.cost_quadratization is None

    rng = np.random.default_rng(6)
    xs = jnp.asarray(rng.standard_normal((5, 4)))
    us = jnp.asarray(rng.standard_normal((5, 2)))
    ad = quadratize_running_cost(p_d.cost, xs, us)
    an = jax.vmap(p_a.cost_quadratization)(xs, us)
    for got, want in zip(an, ad):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-12)

    x = jnp.asarray(rng.standard_normal(4))
    ad_f = quadratize_final_cost(p_d.final_cost, x)
    an_f = p_a.final_cost_quadratization(x)
    for got, want in zip(an_f, ad_f):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-12)


def test_cost_only_depending_on_u_is_fine():
    """The ForwardDiff.jl caveat (src/backward_pass.jl:61-70) must not apply."""

    def cost(x, u):
        return jnp.sum(u ** 2)

    xs = jnp.ones((3, 4))
    us = jnp.ones((3, 2))
    q, qx, ru, Qxx, Pux, Ruu = quadratize_running_cost(cost, xs, us)
    np.testing.assert_allclose(qx, 0.0)
    np.testing.assert_allclose(Pux, 0.0)
    np.testing.assert_allclose(Ruu[0], 2 * np.eye(2), atol=1e-12)


def test_scalar_dynamics_matches_matrix_form():
    """The scalar-expanded continuous_dynamics (VPU-friendly, no tiny
    matmuls — see its docstring) equals the textbook matrix form
    M^{-1}(-C theta_dot + u) built from inertia_matrix/coriolis_matrix,
    for both Coriolis quirk branches."""

    from ilqr_tpu.models.two_link import (
        continuous_dynamics,
        coriolis_matrix,
    )
    from ilqr_tpu.ops.linalg import solve_psd_small

    key = jax.random.PRNGKey(11)
    for faithful in (True, False):
        params = TwoLinkParams(faithful_coriolis=faithful)

        def matrix_form(state, u):
            theta, theta_dot = state[:2], state[2:]
            M = inertia_matrix(params, theta)
            C = coriolis_matrix(params, theta, theta_dot)
            qdd = solve_psd_small(M, -C @ theta_dot + u)
            return jnp.concatenate([theta_dot, qdd])

        for i in range(4):
            kx, ku, key = jax.random.split(jax.random.fold_in(key, i), 3)
            x = jax.random.normal(kx, (4,), jnp.float64)
            u = jax.random.normal(ku, (2,), jnp.float64)
            np.testing.assert_allclose(
                np.asarray(continuous_dynamics(params, x, u)),
                np.asarray(matrix_form(x, u)), rtol=1e-12, atol=1e-12)
            # jacobians too (the backward pass consumes these)
            Ja = jax.jacfwd(lambda s: continuous_dynamics(params, s, u))(x)
            Jm = jax.jacfwd(lambda s: matrix_form(s, u))(x)
            np.testing.assert_allclose(np.asarray(Ja), np.asarray(Jm),
                                       rtol=1e-10, atol=1e-12)

"""Parity vs an independent NumPy implementation of the reference algorithm.

BASELINE.md's correctness target is ``|u - u_ref|_inf < 1e-3`` against
iLQR.jl on the 2-link swing-up.  Without a Julia runtime, ``tests/oracle.py``
re-implements the reference's algorithm (same math, same acceptance order,
same quirks) serially in NumPy/float64; the compiled TPU-shaped solver must
agree with it far below the 1e-3 budget.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ilqr_tpu.backward import backward_pass
from ilqr_tpu.config import ILQRConfig
from ilqr_tpu.models.two_link import make_two_link_problem
from ilqr_tpu.problem import rollout
from ilqr_tpu.solver import solve
from tests.oracle import OracleDerivs, oracle_backward, oracle_fit


def test_backward_pass_matches_oracle():
    problem = make_two_link_problem()
    rng = np.random.default_rng(0)
    T = 40
    x0 = jnp.asarray([0.1, -0.1, 0.0, 0.0])
    us = jnp.asarray(0.3 * rng.standard_normal((T, 2)))
    xs = rollout(problem.dynamics, x0, us)

    res = backward_pass(problem, xs, us, ILQRConfig())
    d = OracleDerivs(problem.dynamics, problem.cost, problem.final_cost)
    duffs_ref, Ks_ref = oracle_backward(d, np.asarray(xs), np.asarray(us), reg=0.01)

    np.testing.assert_allclose(np.asarray(res.duffs), duffs_ref, atol=1e-8)
    np.testing.assert_allclose(np.asarray(res.Ks), Ks_ref, atol=1e-8)


def test_full_solve_matches_oracle_fit():
    """Run both implementations a fixed number of iterations and compare u."""

    problem = make_two_link_problem()
    T = 50
    n_iter = 12
    x0 = jnp.asarray([0.3, 0.7, 0.2, 0.5])
    xs0 = jnp.tile(x0, (T + 1, 1))
    us0 = jnp.zeros((T, 2))

    config = ILQRConfig(max_iter=n_iter, tol=0.0)  # tol=0: never converge early
    result = solve(problem, xs0, us0, config=config)

    xs_ref, us_ref, cost_ref, iters = oracle_fit(
        problem.dynamics, problem.cost, problem.final_cost,
        np.asarray(xs0), np.asarray(us0), max_iter=n_iter, tol=0.0)

    assert int(result.iterations) == iters == n_iter
    err = np.max(np.abs(np.asarray(result.us) - us_ref))
    # Far inside the 1e-3 parity budget: same algorithm, float64 (residual
    # difference comes from Cholesky-vs-LU solves and S symmetrization).
    assert err < 1e-6, err
    np.testing.assert_allclose(float(result.cost), cost_ref, rtol=1e-10)


def test_rbd_backward_pass_matches_oracle():
    """The floating-base RBD arm (n=16, m=8) through the same oracle
    comparison — including the reference's ṙ = v kinematics quirk
    (RBD_helper_functions.jl:68) so the quirk path is parity-tested."""

    from ilqr_tpu.models.rbd.model import make_rbd_arm_problem

    problem = make_rbd_arm_problem(reference_kinematics=True)
    rng = np.random.default_rng(4)
    T = 12
    x0 = jnp.zeros(16)
    us = jnp.asarray(0.05 * rng.standard_normal((T, 8)))
    xs = rollout(problem.dynamics, x0, us)

    res = backward_pass(problem, xs, us, ILQRConfig())
    d = OracleDerivs(problem.dynamics, problem.cost, problem.final_cost)
    duffs_ref, Ks_ref = oracle_backward(d, np.asarray(xs), np.asarray(us),
                                        reg=0.01)

    np.testing.assert_allclose(np.asarray(res.duffs), duffs_ref,
                               rtol=1e-7, atol=1e-7)
    np.testing.assert_allclose(np.asarray(res.Ks), Ks_ref,
                               rtol=1e-7, atol=1e-7)


def test_rbd_solve_matches_oracle_fit():
    """Fixed-iteration full-solve parity on the RBD arm, both kinematics
    charts (quirk and corrected)."""

    from ilqr_tpu.models.rbd.model import make_rbd_arm_problem

    for ref_kin in (True, False):
        problem = make_rbd_arm_problem(reference_kinematics=ref_kin)
        T = 15
        n_iter = 4
        x0 = jnp.zeros(16)
        us0 = jnp.zeros((T, 8))
        xs0 = rollout(problem.dynamics, x0, us0)

        config = ILQRConfig(max_iter=n_iter, tol=0.0)
        result = solve(problem, xs0, us0, config=config)
        xs_ref, us_ref, cost_ref, iters = oracle_fit(
            problem.dynamics, problem.cost, problem.final_cost,
            np.asarray(xs0), np.asarray(us0), max_iter=n_iter, tol=0.0)

        assert int(result.iterations) == iters == n_iter
        err = np.max(np.abs(np.asarray(result.us) - us_ref))
        assert err < 1e-3, (ref_kin, err)  # BASELINE.md budget
        np.testing.assert_allclose(float(result.cost), cost_ref, rtol=1e-8)


@pytest.mark.slow
def test_converged_solve_matches_oracle_to_parity_budget():
    """To convergence (the BASELINE.md criterion), on a shorter horizon."""

    problem = make_two_link_problem()
    T = 40
    x0 = jnp.asarray([0.1, -0.1, 0.0, 0.0])
    xs0 = jnp.tile(x0, (T + 1, 1))
    us0 = jnp.zeros((T, 2))

    config = ILQRConfig(max_iter=5000, tol=1e-6)
    result = solve(problem, xs0, us0, config=config)
    xs_ref, us_ref, cost_ref, iters = oracle_fit(
        problem.dynamics, problem.cost, problem.final_cost,
        np.asarray(xs0), np.asarray(us0), max_iter=5000, tol=1e-6)

    err = np.max(np.abs(np.asarray(result.us) - us_ref))
    assert err < 1e-3, err
    assert int(result.iterations) == iters

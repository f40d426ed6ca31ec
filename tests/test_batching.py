"""Batched (vmap) scenario solving on one device."""

import jax
import jax.numpy as jnp
import numpy as np

from ilqr_tpu.config import ILQRConfig, Status
from ilqr_tpu.models.two_link import make_two_link_problem
from ilqr_tpu.parallel.batching import batch_metrics, batch_solve, make_batch_solver
from ilqr_tpu.problem import rollout
from ilqr_tpu.solver import solve


def test_batch_solve_matches_individual_solves():
    problem = make_two_link_problem()
    T = 30
    B = 4
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(0.2 * rng.standard_normal((B, 4)))
    us0 = jnp.zeros((B, T, 2))
    config = ILQRConfig(max_iter=200, tol=1e-6)

    batched = batch_solve(problem, x0s, us0, config=config)

    for b in range(B):
        xs0 = rollout(problem.dynamics, x0s[b], us0[b])
        single = solve(problem, xs0, us0[b], config=config)
        np.testing.assert_allclose(np.asarray(batched.us[b]),
                                   np.asarray(single.us), atol=1e-9)
        assert int(batched.status[b]) == int(single.status)
        assert int(batched.iterations[b]) == int(single.iterations)


def test_batch_metrics_and_failure_isolation():
    """A scenario engineered to fail must not poison the rest of the batch."""

    problem = make_two_link_problem()
    T = 20
    B = 3
    x0s = jnp.asarray([[0.1, -0.1, 0.0, 0.0],
                       [0.2, 0.3, 0.0, 0.0],
                       [jnp.nan, 0.0, 0.0, 0.0]])  # poisoned scenario
    us0 = jnp.zeros((B, T, 2))
    config = ILQRConfig(max_iter=100, tol=1e-6)
    result = batch_solve(problem, x0s, us0, config=config)

    # Healthy scenarios converge; the NaN scenario fails its line search.
    assert int(result.status[0]) == int(Status.CONVERGED)
    assert int(result.status[1]) == int(Status.CONVERGED)
    assert int(result.status[2]) != int(Status.CONVERGED)
    assert np.all(np.isfinite(np.asarray(result.us[:2])))

    metrics = batch_metrics(result)
    assert int(metrics["n_converged"]) == 2


def test_jitted_batch_solver():
    problem = make_two_link_problem()
    solve_fn = make_batch_solver(problem, ILQRConfig(max_iter=50))
    rng = np.random.default_rng(1)
    x0s = jnp.asarray(0.1 * rng.standard_normal((8, 4)))
    us0 = jnp.zeros((8, 10, 2))
    r = solve_fn(x0s, us0)
    assert r.us.shape == (8, 10, 2)
    assert r.status.shape == (8,)

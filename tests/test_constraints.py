"""Control box constraints (framework extension — the reference ignores
the URDF effort limits it ships, SURVEY.md §2.2)."""

import jax.numpy as jnp
import numpy as np

from ilqr_tpu.config import ILQRConfig, Status
from ilqr_tpu.constraints import box_constrained
from ilqr_tpu.models.two_link import make_two_link_problem
from ilqr_tpu.problem import rollout, total_cost
from ilqr_tpu.solver import solve

U_MAX = 1.5


def _setup(T=60):
    base = make_two_link_problem()
    prob, to_u, to_v = box_constrained(base, -U_MAX, U_MAX)
    x0 = jnp.asarray([0.1, -0.1, 0.0, 0.0])
    us0 = jnp.zeros((T, 2))
    vs0 = to_v(us0)
    xs0 = rollout(prob.dynamics, x0, vs0)
    return base, prob, to_u, to_v, xs0, vs0


def test_squash_roundtrip():
    _, _, to_u, to_v, _, _ = _setup()
    us = jnp.asarray([[0.3, -1.2], [1.4999, -0.0]])
    np.testing.assert_allclose(np.asarray(to_u(to_v(us))), np.asarray(us),
                               atol=1e-9)


def test_solve_respects_limits_and_converges():
    base, prob, to_u, _, xs0, vs0 = _setup()
    config = ILQRConfig(max_iter=60, tol=1e-8)
    result = solve(prob, xs0, vs0, config=config)

    us = np.asarray(to_u(result.us))
    assert np.all(np.abs(us) < U_MAX)  # strictly feasible by construction
    assert int(result.status) in (int(Status.CONVERGED), int(Status.MAX_ITER),
                                  int(Status.LINESEARCH_FAILED))

    # The constrained solution actually uses the budget: the unconstrained
    # solution exceeds it, and the constrained one pushes near it.
    unconstrained = solve(base, xs0, jnp.zeros_like(vs0),
                          config=ILQRConfig(max_iter=60))
    assert float(jnp.max(jnp.abs(unconstrained.us))) > U_MAX
    assert np.max(np.abs(us)) > 0.8 * U_MAX

    # And it still swings the arm toward the target: cost drops well below
    # the do-nothing rollout cost.
    idle = total_cost(prob, xs0, vs0)
    assert float(result.cost) < 0.6 * float(idle)


def test_composes_with_vmap_batching():
    from ilqr_tpu.parallel.batching import batch_solve

    _, prob, to_u, _, xs0, vs0 = _setup(T=40)
    B = 3
    x0_b = jnp.tile(xs0[0][None], (B, 1))
    vs_b = jnp.tile(vs0[None], (B, 1, 1))
    res = batch_solve(prob, x0_b, vs_b, config=ILQRConfig(max_iter=25))
    us = np.asarray(to_u(res.us))
    assert us.shape == (B, 40, 2)
    assert np.all(np.abs(us) < U_MAX)

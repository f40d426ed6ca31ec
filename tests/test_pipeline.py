"""Pipeline-parallel (PP) solver: phase stages over a 2-device ring.

Checks the §2.4 PP row: the backward/forward phase pipeline
(`parallel.pipeline.pipelined_solve`) must reproduce the fused
single-device solver exactly in semantics — same iterates, same statuses —
because a microbatch's forward phase consumes precisely the backward
outputs computed for its state one tick earlier.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ilqr_tpu.batched import batched_solve_fused
from ilqr_tpu.config import ILQRConfig, Status
from ilqr_tpu.models.two_link import make_two_link_problem
from ilqr_tpu.parallel.pipeline import make_pipeline_mesh, pipelined_solve
from ilqr_tpu.problem import rollout


def _problem_batch(B=8, T=24, dtype=jnp.float32):
    problem = make_two_link_problem()
    key = jax.random.PRNGKey(3)
    nominal = jnp.asarray([0.3, 0.7, 0.2, 0.5], dtype)
    x0s = nominal + 0.1 * jax.random.normal(key, (B, 4), dtype)
    us0 = jnp.zeros((B, T, 2), dtype)
    return problem, x0s, us0


def _fused_reference(problem, x0s, us0, config):
    roll = jax.vmap(lambda x0, us: rollout(problem.dynamics, x0, us))
    return batched_solve_fused(problem, roll(x0s, us0), us0, config=config)


@pytest.mark.parametrize("config", [
    ILQRConfig(max_iter=6, tol=1e-5, tol_grad=1e-10, tol_grad_rel=1e-6),
    # Adaptive Tassa reg exercises the reg bookkeeping across the ring.
    ILQRConfig(max_iter=6, tol=1e-5, tol_grad=1e-10, tol_grad_rel=1e-6,
               adaptive_reg=True, reg_backtrack_trigger=2),
])
def test_pipelined_matches_fused(config):
    problem, x0s, us0 = _problem_batch()
    mesh = make_pipeline_mesh(jax.devices("cpu"))
    got = pipelined_solve(problem, mesh, x0s, us0, config=config)
    want = _fused_reference(problem, x0s, us0, config)

    np.testing.assert_allclose(np.asarray(got.us), np.asarray(want.us),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(got.cost), np.asarray(want.cost),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(got.status),
                                  np.asarray(want.status))
    np.testing.assert_array_equal(np.asarray(got.iterations),
                                  np.asarray(want.iterations))


def test_pipelined_converges():
    problem, x0s, us0 = _problem_batch(B=4, T=32)
    mesh = make_pipeline_mesh(jax.devices("cpu"))
    config = ILQRConfig(max_iter=25, tol=1e-5, tol_grad=1e-10,
                        tol_grad_rel=1e-6)
    result = pipelined_solve(problem, mesh, x0s, us0, config=config)
    status = np.asarray(result.status)
    assert np.all(status == int(Status.CONVERGED)), status
    # Scenario order preserved: lane i of the pipelined result is lane i
    # of the input batch.
    want = _fused_reference(problem, x0s, us0, config)
    np.testing.assert_allclose(np.asarray(result.cost),
                               np.asarray(want.cost), rtol=1e-6)

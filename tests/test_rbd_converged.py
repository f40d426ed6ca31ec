"""Reference-scale RBD convergence regression.

Round-2 review finding: no test ran the RBD problem to a converged
trajectory at the reference example's scale
(animate_RBD_2_link.jl:8-20 — N=1000, dt=0.01, pose target
[0,0,0,5,1,2,1,.3], initial configuration quat[0,0,0,1]/base [.5,.75,1.]).
These do, against the committed converged golden
(tests/fixtures/rbd_T1000_converged.npz, regenerate with
scripts/make_rbd_converged_fixture.py).

The fast test validates the fixture point itself (cost reproduces,
first-order stationarity at the solution); the slow test re-solves from
scratch and must reach CONVERGED at the fixture.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ilqr_tpu.config import ILQRConfig, Status
from ilqr_tpu.models.rbd.model import make_rbd_arm_problem
from ilqr_tpu.problem import rollout, total_cost
from ilqr_tpu.solver import solve

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "rbd_T1000_converged.npz")
TARGET = np.array([0.0, 0.0, 0.0, 5.0, 1.0, 2.0, 1.0, 0.3])

CONFIG = ILQRConfig(max_iter=100, tol=1e-5, tol_grad=1e-10,
                    tol_grad_rel=1e-6, scan_unroll=1,
                    adaptive_reg=True, reg=1.0, reg_min=1e-3,
                    reg_scale=10.0, reg_backtrack_trigger=1)


@pytest.fixture(scope="module")
def fixture_data():
    assert os.path.exists(FIXTURE), (
        "missing fixture; run scripts/make_rbd_converged_fixture.py")
    return np.load(FIXTURE)


def test_fixture_is_converged_solution(fixture_data):
    """The committed golden is physically at the target and its cost
    reproduces through the compiled cost path."""

    xs = fixture_data["xs"]
    us = fixture_data["us"]
    assert xs.shape == (1001, 16) and us.shape == (1000, 8)

    pose_err = np.abs(xs[-1, :8] - TARGET)
    assert pose_err.max() < 2e-2, pose_err

    problem = make_rbd_arm_problem()
    cost = float(total_cost(problem, jnp.asarray(xs), jnp.asarray(us)))
    np.testing.assert_allclose(cost, float(fixture_data["cost"]),
                               rtol=1e-9)

    # The rollout of the fixture controls from the fixture x0 must
    # reproduce the fixture states (dynamics consistency).
    xs_re = np.asarray(rollout(problem.dynamics,
                               jnp.asarray(xs[0]), jnp.asarray(us)))
    np.testing.assert_allclose(xs_re, xs, rtol=1e-7, atol=1e-8)


def test_fixture_first_order_stationary(fixture_data):
    """One backward pass at the fixture predicts ~zero linear decrease —
    the golden really is a solver fixed point, not a snapshot mid-descent."""

    from ilqr_tpu.backward import backward_pass

    problem = make_rbd_arm_problem()
    xs = jnp.asarray(fixture_data["xs"])
    us = jnp.asarray(fixture_data["us"])
    b = backward_pass(problem, xs, us, CONFIG.replace(reg=1e-3))
    cost = float(fixture_data["cost"])
    assert abs(float(b.dV1)) <= 1e-4 * cost, (float(b.dV1), cost)


@pytest.mark.slow
def test_rbd_reference_scale_solve_converges(fixture_data):
    """Full f64 solve from the reference initial state reaches CONVERGED
    and lands on the committed golden."""

    problem = make_rbd_arm_problem()
    x0 = jnp.asarray(fixture_data["x0"])
    us0 = jnp.zeros((1000, 8), x0.dtype)
    xs0 = rollout(problem.dynamics, x0, us0)
    result = jax.jit(
        lambda a, b: solve(problem, a, b, config=CONFIG))(xs0, us0)
    assert int(result.status) == int(Status.CONVERGED)
    np.testing.assert_allclose(np.asarray(result.us), fixture_data["us"],
                               rtol=1e-6, atol=1e-8)
    pose_err = np.abs(np.asarray(result.xs)[-1, :8] - TARGET)
    assert pose_err.max() < 2e-2, pose_err

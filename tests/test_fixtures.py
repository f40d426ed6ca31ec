"""Golden-trajectory fixture parity tests.

The ``tests/fixtures/*.npz`` files freeze float64 solves from the NumPy
oracle (tests/oracle.py — the stand-in for the unavailable Julia runtime;
regenerate with ``python scripts/make_fixtures.py``).  The compiled solver
must reproduce them within the BASELINE.md parity budget
``|u - u_ref|_inf < 1e-3`` — and, since both sides are float64
implementations of the same algorithm, far inside it.  These tests are
FAST (one compiled solve each) and guard parity regressions across rounds
without re-running the oracle.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from ilqr_tpu.config import ILQRConfig
from ilqr_tpu.solver import solve

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures")

PARITY_BUDGET = 1e-3   # BASELINE.md: |u - u_ref|_inf < 1e-3
TIGHT_BUDGET = 1e-6    # same algorithm in f64: regression-guard bound


def _load(name):
    path = os.path.join(FIXTURE_DIR, f"{name}.npz")
    if not os.path.exists(path):
        pytest.skip(f"fixture {name} not generated "
                    "(run scripts/make_fixtures.py)")
    return np.load(path)


def _solve_like_fixture(problem, fx):
    """Run the compiled solver under the fixture's exact stopping rule."""

    iters = int(fx["iterations"])
    tol = float(fx["tol"])
    if bool(fx["converged"]):
        # Converged fixture: same tol, ample iteration headroom.
        config = ILQRConfig(max_iter=iters + 50, tol=tol)
    else:
        # Fixed-iteration fixture: run exactly as many iterations.
        config = ILQRConfig(max_iter=iters, tol=0.0)
    result = solve(problem, jnp.asarray(fx["xs0"]), jnp.asarray(fx["us0"]),
                   config=config)
    return result


def test_two_link_T100_fixture_parity():
    from ilqr_tpu.models.two_link import make_two_link_problem

    fx = _load("two_link_T100")
    result = _solve_like_fixture(make_two_link_problem(), fx)

    err = float(np.max(np.abs(np.asarray(result.us) - fx["us_ref"])))
    assert err < PARITY_BUDGET, err
    assert err < TIGHT_BUDGET, err
    if bool(fx["converged"]):
        assert int(result.iterations) == int(fx["iterations"])
    np.testing.assert_allclose(float(result.cost), float(fx["cost_ref"]),
                               rtol=1e-9)


@pytest.mark.slow
def test_two_link_T900_fixture_parity():
    from ilqr_tpu.models.two_link import make_two_link_problem

    fx = _load("two_link_T900")
    result = _solve_like_fixture(make_two_link_problem(), fx)

    err = float(np.max(np.abs(np.asarray(result.us) - fx["us_ref"])))
    assert err < PARITY_BUDGET, err
    assert err < TIGHT_BUDGET, err
    np.testing.assert_allclose(float(result.cost), float(fx["cost_ref"]),
                               rtol=1e-9)


def test_rbd_T500_fixture_parity():
    from ilqr_tpu.models.rbd.model import make_rbd_arm_problem

    fx = _load("rbd_T500")
    problem = make_rbd_arm_problem(
        reference_kinematics=bool(fx["reference_kinematics"]))
    result = _solve_like_fixture(problem, fx)

    err = float(np.max(np.abs(np.asarray(result.us) - fx["us_ref"])))
    assert err < PARITY_BUDGET, err
    np.testing.assert_allclose(float(result.cost), float(fx["cost_ref"]),
                               rtol=1e-8)


def test_fixture_parity_fused_engine():
    """The fused batch-last engine hits the same fixture (1-lane batch)."""

    from ilqr_tpu.batched import batched_solve_fused
    from ilqr_tpu.models.two_link import make_two_link_problem

    fx = _load("two_link_T100")
    iters = int(fx["iterations"])
    config = (ILQRConfig(max_iter=iters + 50, tol=float(fx["tol"]))
              if bool(fx["converged"])
              else ILQRConfig(max_iter=iters, tol=0.0))
    result = batched_solve_fused(
        make_two_link_problem(),
        jnp.asarray(fx["xs0"])[None], jnp.asarray(fx["us0"])[None],
        config=config)
    err = float(np.max(np.abs(np.asarray(result.us[0]) - fx["us_ref"])))
    assert err < TIGHT_BUDGET, err

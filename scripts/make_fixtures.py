"""Generate golden-trajectory fixtures from the NumPy oracle.

Freezes float64 oracle solves (tests/oracle.py — the independent
re-implementation of the reference algorithm, the stand-in for the
unavailable Julia runtime, see BASELINE.md) as ``.npz`` fixtures under
``tests/fixtures/``, so solver parity is regression-guarded across rounds
without re-running the slow oracle.

Configs frozen (mirroring the reference's own problem setups):

* ``two_link_T100`` — the reference integration-test setup
  (test/test_iLQR.jl:10-17): constant-state initial trajectory, zero
  torques, run to convergence at tol=1e-6.
* ``two_link_T900`` — the animation example's swing-up
  (test/2_link_example/animate_2_link.jl:9-16): open-loop rollout init,
  frozen after a fixed 200 iterations (full convergence takes tens of
  thousands of f64 iterations; a fixed-iteration fixture guards parity
  just as strictly and regenerates in minutes).
* ``rbd_T500`` — the floating-base arm (RBD_helper_functions.jl:85-116 +
  animate_RBD_2_link.jl:8-20 target), reference_kinematics=True (the
  reference's ṙ = v chart), frozen after a fixed 25 iterations.

Run: ``python scripts/make_fixtures.py [--only NAME]``
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_device", jax.devices("cpu")[0])

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")


def _save(name, xs0, us0, xs_ref, us_ref, cost_ref, iters, meta):
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    path = os.path.join(FIXTURE_DIR, f"{name}.npz")
    np.savez_compressed(
        path,
        xs0=np.asarray(xs0, np.float64),
        us0=np.asarray(us0, np.float64),
        xs_ref=np.asarray(xs_ref, np.float64),
        us_ref=np.asarray(us_ref, np.float64),
        cost_ref=np.float64(cost_ref),
        iterations=np.int64(iters),
        **meta,
    )
    print(f"wrote {path}: iters={iters} cost={cost_ref:.9g}")


def make_two_link_T100():
    from ilqr_tpu.models.two_link import make_two_link_problem
    from tests.oracle import oracle_fit

    problem = make_two_link_problem()
    T = 100
    x0 = np.asarray([0.3, 0.7, 0.2, 0.5])
    xs0 = np.tile(x0, (T + 1, 1))
    us0 = np.zeros((T, 2))

    t0 = time.time()
    xs, us, cost, iters = oracle_fit(
        problem.dynamics, problem.cost, problem.final_cost,
        xs0, us0, max_iter=20000, tol=1e-6)
    print(f"two_link_T100: {iters} iters in {time.time()-t0:.1f}s")
    converged = iters < 20000
    _save("two_link_T100", xs0, us0, xs, us, cost, iters,
          {"tol": np.float64(1e-6), "converged": np.bool_(converged)})


def make_two_link_T900(n_iter=200):
    from ilqr_tpu.models.two_link import make_two_link_problem
    from ilqr_tpu.problem import rollout
    from tests.oracle import oracle_fit

    problem = make_two_link_problem()
    T = 900
    x0 = jnp.asarray([0.1, -0.1, 0.0, 0.0])
    us0 = np.zeros((T, 2))
    xs0 = np.asarray(rollout(problem.dynamics, x0, jnp.asarray(us0)))

    t0 = time.time()
    # tol=0: fixed-iteration fixture (full convergence takes tens of
    # thousands of iterations); the oracle may stop earlier if its f64
    # line search exhausts — the recorded count is whatever it ran.
    xs, us, cost, iters = oracle_fit(
        problem.dynamics, problem.cost, problem.final_cost,
        xs0, us0, max_iter=n_iter, tol=0.0, verbose_every=10)
    print(f"two_link_T900: {iters} iters in {time.time()-t0:.1f}s")
    _save("two_link_T900", xs0, us0, xs, us, cost, iters,
          {"tol": np.float64(0.0), "converged": np.bool_(False)})


def make_rbd_T500(n_iter=25):
    from ilqr_tpu.models.rbd.model import make_rbd_arm_problem
    from ilqr_tpu.problem import rollout
    from tests.oracle import oracle_fit

    problem = make_rbd_arm_problem(reference_kinematics=True)
    T = 500
    x0 = jnp.zeros(16)
    us0 = np.zeros((T, 8))
    xs0 = np.asarray(rollout(problem.dynamics, x0, jnp.asarray(us0)))

    t0 = time.time()
    xs, us, cost, iters = oracle_fit(
        problem.dynamics, problem.cost, problem.final_cost,
        xs0, us0, max_iter=n_iter, tol=0.0)
    print(f"rbd_T500: {iters} iters in {time.time()-t0:.1f}s")
    assert iters == n_iter
    _save("rbd_T500", xs0, us0, xs, us, cost, iters,
          {"tol": np.float64(0.0), "converged": np.bool_(False),
           "reference_kinematics": np.bool_(True)})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None,
                    choices=["two_link_T100", "two_link_T900", "rbd_T500"])
    args = ap.parse_args()
    jobs = {
        "two_link_T100": make_two_link_T100,
        "two_link_T900": make_two_link_T900,
        "rbd_T500": make_rbd_T500,
    }
    if args.only:
        jobs[args.only]()
    else:
        for f in jobs.values():
            f()


if __name__ == "__main__":
    main()

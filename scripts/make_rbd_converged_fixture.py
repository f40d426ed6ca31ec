"""Generate the converged reference-scale RBD fixture
(tests/fixtures/rbd_T1000_converged.npz).

Solves the reference example's own problem — floating-base 2-DoF arm,
N=1000, dt=0.01, initial configuration quat[0,0,0,1] / base [.5,.75,1.] /
joints 0 (RBD_helper_functions.jl:9), pose target [0,0,0,5,1,2,1,.3]
(animate_RBD_2_link.jl:10) — to CONVERGED with the Tassa reg schedule in
float64 on CPU, and freezes the solution.

The fixture is a *regression* golden for the compiled solver (the
NumPy oracle mirrors the reference's fixed-reg semantics, under which
this problem crawls for thousands of iterations — the adaptive schedule
is a framework extension, so the golden is the framework's own f64
solution, verified converged + physically at the target).

Run: python scripts/make_rbd_converged_fixture.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_device", jax.devices("cpu")[0])

import jax.numpy as jnp
import numpy as np

from ilqr_tpu.config import ILQRConfig, Status
from ilqr_tpu.models.rbd.model import make_rbd_arm_problem
from ilqr_tpu.problem import rollout
from ilqr_tpu.solver import solve

T = 1000
TARGET = np.array([0.0, 0.0, 0.0, 5.0, 1.0, 2.0, 1.0, 0.3])
# The solver setup that converges on this problem (BENCH.md round 3).
CONFIG = ILQRConfig(max_iter=100, tol=1e-5, tol_grad=1e-10,
                    tol_grad_rel=1e-6, scan_unroll=1,
                    adaptive_reg=True, reg=1.0, reg_min=1e-3,
                    reg_scale=10.0, reg_backtrack_trigger=1)
X0 = jnp.asarray([0.0, 0.0, 1.0, 0.5, 0.75, 1.0, 0.0, 0.0] + [0.0] * 8,
                 jnp.float64)


def main():
    problem = make_rbd_arm_problem()
    us0 = jnp.zeros((T, 8), jnp.float64)
    xs0 = rollout(problem.dynamics, X0, us0)

    t0 = time.time()
    result = jax.jit(
        lambda a, b: solve(problem, a, b, config=CONFIG))(xs0, us0)
    jax.block_until_ready(result.us)
    status = int(result.status)
    print(f"solved in {time.time()-t0:.0f}s: status={Status(status).name} "
          f"iters={int(result.iterations)} cost={float(result.cost):.8e}")
    assert status == int(Status.CONVERGED), status

    xN = np.asarray(result.xs)[-1]
    pose_err = np.abs(xN[:8] - TARGET)
    print("terminal pose |err|:", pose_err)
    assert pose_err.max() < 2e-2, pose_err

    out = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures",
                       "rbd_T1000_converged.npz")
    np.savez_compressed(
        out,
        xs=np.asarray(result.xs),
        us=np.asarray(result.us),
        cost=np.asarray(result.cost),
        iterations=np.asarray(result.iterations),
        x0=np.asarray(X0),
        target=TARGET,
    )
    print("wrote", os.path.abspath(out))


if __name__ == "__main__":
    main()

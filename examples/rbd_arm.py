"""Floating-base URDF arm example (the reference's RBD_2_link example).

Mirrors test/RBD_2_link_example/animate_RBD_2_link.jl: load the 2-DoF arm
URDF as a floating-base mechanism (zero gravity), roll out zero torques
from the example's initial pose, fit with iLQR toward the 8-D target pose,
and report per-iteration costs.

    python examples/rbd_arm.py [--steps 1000] [--max-iter 50] [--cpu]

``--cpu`` pins the run to the host CPU backend — useful where the TPU is
reached through a remote-compile tunnel whose compile time scales badly
with program size (the RBD dynamics trace is large).
"""

import argparse
import os
import sys

# Allow running the example without installing the package.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ilqr_tpu.config import ILQRConfig
from ilqr_tpu.models.rbd.model import make_rbd_arm_problem
from ilqr_tpu.problem import rollout
from ilqr_tpu.utils.metrics import solve_with_trace


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--max-iter", type=int, default=50)
    ap.add_argument("--cpu", action="store_true",
                    help="run on the host CPU backend")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_default_device", jax.devices("cpu")[0])

    problem = make_rbd_arm_problem()  # target pose [0,0,0, 5,1,2, 1,.3]

    # Initial configuration from animate_RBD_2_link.jl:9 (identity attitude,
    # base at (.5,.75,1), joints at zero), zero velocity.
    x0 = jnp.concatenate([
        jnp.zeros(3), jnp.asarray([0.5, 0.75, 1.0]), jnp.zeros(2),
        jnp.zeros(8),
    ])
    us0 = jnp.zeros((args.steps, 8))
    xs0 = rollout(problem.dynamics, x0, us0)

    config = ILQRConfig(max_iter=args.max_iter, tol=1e-6)
    result, trace = solve_with_trace(problem, xs0, us0, config=config)

    n = int(result.iterations)
    for i in range(n):
        print(f"Iteration: {i + 1}\tTotal Cost: {float(trace.cost[i]):.6f}")
    final_pose = result.xs[-1, :8]
    print(f"status={int(result.status)} iterations={n}")
    print("final pose:", [round(float(v), 3) for v in final_pose])


if __name__ == "__main__":
    main()

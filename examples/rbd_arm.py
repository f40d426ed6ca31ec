"""Floating-base URDF arm example (the reference's RBD_2_link example).

Mirrors test/RBD_2_link_example/animate_RBD_2_link.jl: load the 2-DoF arm
URDF as a floating-base mechanism (zero gravity), roll out zero torques
from the example's initial pose, fit with iLQR toward the 8-D target pose,
report per-iteration costs, and (with ``--out``) render a 3-D stick-figure
animation of the link frames via world-frame forward kinematics — the
matplotlib stand-in for the reference's MeshCat render
(animate_RBD_2_link.jl:40-56).

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
    ap.add_argument("--out", type=str, default=None,
                    help="write a 3-D animation GIF to this path")
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

    if args.out:
        _animate(result.xs, args.out)


def _animate(xs, out_path):
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.animation as animation
        import matplotlib.pyplot as plt
    except ImportError:
        print("matplotlib unavailable; skipping animation", file=sys.stderr)
        return

    import jax
    import numpy as np

    from ilqr_tpu.models.rbd.kinematics import forward_kinematics
    from ilqr_tpu.models.rbd.model import TWO_DOF_ARM_URDF, mrp_to_rbd_state
    from ilqr_tpu.models.rbd.urdf import parse_urdf

    mech = parse_urdf(TWO_DOF_ARM_URDF, floating=True,
                      gravity=(0.0, 0.0, 0.0))
    nq = mech.nq

    @jax.jit
    def link_positions(x):
        q = mrp_to_rbd_state(x)[:nq]
        return jnp.stack([p for _, p in forward_kinematics(mech, q)])

    xs = np.asarray(xs)
    stride = max(1, len(xs) // 90)
    frames = [np.asarray(link_positions(jnp.asarray(x)))
              for x in xs[::stride]]

    fig = plt.figure(figsize=(5, 5))
    ax = fig.add_subplot(projection="3d")
    allp = np.concatenate(frames)
    lo, hi = allp.min() - 0.5, allp.max() + 0.5
    ax.set_xlim(lo, hi); ax.set_ylim(lo, hi); ax.set_zlim(lo, hi)
    ax.scatter([5.0], [1.0], [2.0], marker="*", s=120, color="green")
    line, = ax.plot([], [], [], "o-", lw=3, color="tab:red")

    def draw(i):
        p = frames[i]
        line.set_data(p[:, 0], p[:, 1])
        line.set_3d_properties(p[:, 2])
        return (line,)

    ani = animation.FuncAnimation(fig, draw, frames=len(frames))
    ani.save(out_path, writer="pillow", fps=20)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()

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
    ap.add_argument("--png", type=str, default=None,
                    help="write a static trajectory plot to this path")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_default_device", jax.devices("cpu")[0])

    problem = make_rbd_arm_problem()  # target pose [0,0,0, 5,1,2, 1,.3]

    # Initial configuration from RBD_helper_functions.jl:9: quaternion
    # [0,0,0,1] (180 deg about z -> MRP [0,0,1]), base at (.5,.75,1),
    # joints at zero, zero velocity.
    x0 = jnp.concatenate([
        jnp.asarray([0.0, 0.0, 1.0]), jnp.asarray([0.5, 0.75, 1.0]),
        jnp.zeros(2), jnp.zeros(8),
    ])
    us0 = jnp.zeros((args.steps, 8))
    xs0 = rollout(problem.dynamics, x0, us0)

    # Tassa reg escalation: the setting under which this problem converges
    # in ~40 iterations (BENCH.md round 3; the reference's fixed reg=0.01
    # crawls through its max_iter=1e6 budget instead).
    config = ILQRConfig(max_iter=args.max_iter, tol=1e-5, tol_grad=1e-10,
                        tol_grad_rel=1e-6, scan_unroll=1,
                        adaptive_reg=True, reg=1.0, reg_min=1e-3,
                        reg_scale=10.0, reg_backtrack_trigger=1)
    result, trace = solve_with_trace(problem, xs0, us0, config=config)

    n = int(result.iterations)
    import math
    for i in range(n):
        c = float(trace.cost[i])
        # inf marks an iteration whose ladder was skipped (stationarity
        # gate) — there is no candidate cost to print.
        print(f"Iteration: {i + 1}\tTotal Cost: "
              f"{'(stationary)' if math.isinf(c) else f'{c:.6f}'}")
    final_pose = result.xs[-1, :8]
    print(f"status={int(result.status)} iterations={n}")
    print("final pose:", [round(float(v), 3) for v in final_pose])

    if args.out:
        _animate(result.xs, args.out)
    if args.png:
        _plot_trajectory(result.xs, args.png)


def _plot_trajectory(xs, out_path):
    """Static committed-artifact plot: base position + joints vs time."""

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    xs = np.asarray(xs)
    t = np.arange(len(xs)) * 0.01
    fig, axes = plt.subplots(1, 3, figsize=(12, 3.5), constrained_layout=True)
    for i, (lbl, tgt) in enumerate(zip("xyz", [5.0, 1.0, 2.0])):
        axes[0].plot(t, xs[:, 3 + i], label=f"base {lbl}")
        axes[0].axhline(tgt, ls="--", lw=0.8, color="gray")
    axes[0].set(title="base position [m]", xlabel="t [s]")
    axes[0].legend(loc="best", fontsize=8)
    for j, tgt in enumerate([1.0, 0.3]):
        axes[1].plot(t, xs[:, 6 + j], label=f"joint {j}")
        axes[1].axhline(tgt, ls="--", lw=0.8, color="gray")
    axes[1].set(title="joint angles [rad]", xlabel="t [s]")
    axes[1].legend(loc="best", fontsize=8)
    for i, lbl in enumerate("xyz"):
        axes[2].plot(t, xs[:, i], label=f"MRP {lbl}")
        axes[2].axhline(0.0, ls="--", lw=0.8, color="gray")
    axes[2].set(title="attitude (MRP)", xlabel="t [s]")
    axes[2].legend(loc="best", fontsize=8)
    fig.suptitle("RBD floating-base arm: converged iLQR trajectory "
                 "(targets dashed)")
    fig.savefig(out_path, dpi=110)
    print(f"wrote {out_path}")


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

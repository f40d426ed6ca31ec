"""2-link swing-up example: rollout an initial guess, fit, render a GIF.

Mirrors the reference's example pipeline
(test/2_link_example/animate_2_link.jl): open-loop rollout of zero torque
from [.1, -.1, 0, 0] for N=900 steps, iLQR fit to tol 1e-6, then an
animation of the arm converging onto the workspace target.

    python examples/two_link_swingup.py [--steps 900] [--out swingup.gif]
"""

import argparse
import os
import sys

# Allow running the example without installing the package.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ilqr_tpu.config import ILQRConfig
from ilqr_tpu.models.two_link import (
    TwoLinkParams,
    forward_kinematics,
    make_two_link_problem,
)
from ilqr_tpu.problem import rollout
from ilqr_tpu.utils.metrics import solve_with_trace


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=900)
    ap.add_argument("--out", type=str, default="two_link_swingup.gif")
    ap.add_argument("--max-iter", type=int, default=40)
    ap.add_argument("--png", type=str, default=None,
                    help="write a static arm-motion plot to this path")
    ap.add_argument("--cpu", action="store_true",
                    help="run on the host CPU backend")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_default_device", jax.devices("cpu")[0])

    params = TwoLinkParams()
    problem = make_two_link_problem(params)
    x0 = jnp.asarray([0.1, -0.1, 0.0, 0.0])
    us0 = jnp.zeros((args.steps, 2))
    xs0 = rollout(problem.dynamics, x0, us0)

    config = ILQRConfig(max_iter=args.max_iter, tol=1e-6)
    result, trace = solve_with_trace(problem, xs0, us0, config=config)
    n = int(result.iterations)
    import math
    for i in range(n):
        c = float(trace.cost[i])
        print(f"Iteration: {i + 1}\tTotal Cost: "
              f"{'(stationary)' if math.isinf(c) else f'{c:.6f}'}"
              f"\talpha={float(trace.alpha[i]):.3g}")
    print(f"status={int(result.status)} iterations={n} "
          f"final cost={float(result.cost):.6f} "
          f"terminal joint err={float(problem.final_cost(result.xs[-1])):.3e}")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.animation as animation
        import matplotlib.pyplot as plt
    except ImportError:
        print("matplotlib unavailable; skipping animation", file=sys.stderr)
        return

    xs = np.asarray(result.xs)
    fig, ax = plt.subplots(figsize=(4, 4))
    ax.set_xlim(-2, 2); ax.set_ylim(-2, 2); ax.set_aspect("equal")
    ax.plot(params.target_x, params.target_y, "g*", markersize=12)
    line, = ax.plot([], [], "o-", lw=4, color="tab:red", alpha=0.7)

    stride = max(1, len(xs) // 90)
    frames = range(0, len(xs), stride)

    def draw(t):
        j1, tool = forward_kinematics(params, jnp.asarray(xs[t, :2]))
        line.set_data([0.0, float(j1[0]), float(tool[0])],
                      [0.0, float(j1[1]), float(tool[1])])
        return (line,)

    ani = animation.FuncAnimation(fig, draw, frames=frames, blit=True)
    ani.save(args.out, writer="pillow", fps=20)
    print(f"wrote {args.out}")

    if args.png:
        # Committed-artifact still: arm poses fading in over the motion,
        # the analogue of the reference's committed GIF frames
        # (test/2_link_example/figures/).
        fig2, ax2 = plt.subplots(figsize=(4.5, 4.5))
        ax2.set_xlim(-2, 2); ax2.set_ylim(-2, 2); ax2.set_aspect("equal")
        ax2.plot(params.target_x, params.target_y, "g*", markersize=14,
                 zorder=5)
        n_pose = 24
        idx = np.linspace(0, len(xs) - 1, n_pose).astype(int)
        for rank, t in enumerate(idx):
            j1, tool = forward_kinematics(params, jnp.asarray(xs[t, :2]))
            a = 0.08 + 0.92 * rank / (n_pose - 1)
            ax2.plot([0.0, float(j1[0]), float(tool[0])],
                     [0.0, float(j1[1]), float(tool[1])],
                     "o-", lw=2.5, color="tab:red", alpha=a)
        ax2.set_title("2-link swing-up: converged iLQR motion\n"
                      "(opacity = time; star = workspace target)")
        fig2.savefig(args.png, dpi=110, bbox_inches="tight")
        print(f"wrote {args.png}")


if __name__ == "__main__":
    main()

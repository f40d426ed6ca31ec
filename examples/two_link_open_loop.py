"""Open-loop rollout example (counterpart of the reference's
test/2_link_example/animate_2_link_open_loop.jl): roll the passive 2-link
arm forward under zero torque and render the motion.

    python examples/two_link_open_loop.py [--steps 900] [--out open_loop.gif]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from ilqr_tpu.models.two_link import TwoLinkParams, forward_kinematics, make_dynamics
from ilqr_tpu.problem import rollout


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=900)
    ap.add_argument("--out", type=str, default="two_link_open_loop.gif")
    ap.add_argument("--cpu", action="store_true",
                    help="pin to the host CPU backend")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_default_device", jax.devices("cpu")[0])

    params = TwoLinkParams()
    dynamics = make_dynamics(params)
    x0 = jnp.asarray([0.1, -0.1, 0.0, 0.0])
    us = jnp.zeros((args.steps, 2))
    xs = rollout(dynamics, x0, us)
    print(f"rolled out {args.steps} steps; final state "
          f"{[round(float(v), 4) for v in xs[-1]]}")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.animation as animation
        import matplotlib.pyplot as plt
    except ImportError:
        print("matplotlib unavailable; skipping animation", file=sys.stderr)
        return

    xs_np = np.asarray(xs)
    fig, ax = plt.subplots(figsize=(4, 4))
    ax.set_xlim(-2, 2); ax.set_ylim(-2, 2); ax.set_aspect("equal")
    line, = ax.plot([], [], "o-", lw=4, color="tab:blue", alpha=0.7)

    stride = max(1, len(xs_np) // 90)

    def draw(t):
        j1, tool = forward_kinematics(params, jnp.asarray(xs_np[t, :2]))
        line.set_data([0.0, float(j1[0]), float(tool[0])],
                      [0.0, float(j1[1]), float(tool[1])])
        return (line,)

    ani = animation.FuncAnimation(fig, draw,
                                  frames=range(0, len(xs_np), stride),
                                  blit=True)
    ani.save(args.out, writer="pillow", fps=20)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

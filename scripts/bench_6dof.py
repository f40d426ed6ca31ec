"""6-DoF arm (the reference's unused test/urdf/6Dof_arm.urdf asset) —
derivative-sweep + short-solve timing.

Round-4 context: scalar-expression CRBA/RNEA is gated to <=4 bodies
because the unstructured scalar DAG makes XLA compiles pathological
(>40 min for this arm).  The round-5 explicit dRNEA sweep
(`rnea_derivatives`) has no such gate — this script measures whether the
6-DoF arm now has a fast analytic derivative path (VERDICT r4 next #6).

    python scripts/bench_6dof.py [--cpu] [--batch 64] [--T 50]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

REPS = 4


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--T", type=int, default=50)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--solve", action="store_true",
                    help="also run a short batched solve end-to-end")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_default_device", jax.devices("cpu")[0])

    from ilqr_tpu import batched as bl
    from ilqr_tpu.models.rbd.model import ASSET_DIR, make_rbd_arm_problem
    from ilqr_tpu.models.rbd.dynamics import use_scalar_algebra
    from ilqr_tpu.precision import highest_precision

    urdf = os.path.join(ASSET_DIR, "6Dof_arm.urdf")
    # 6 revolute joints on a floating base: nv = 12, n = 24, m = 12.
    target = [0.0, 0.0, 0.0, 1.0, 1.0, 1.0] + [0.3] * 6
    B, T = args.batch, args.T
    dtype = jnp.float32

    problems = {
        "explicit dRNEA (r5)": make_rbd_arm_problem(
            target_pose=target, urdf_path=urdf),
        "JVP replay (r4)": make_rbd_arm_problem(
            target_pose=target, urdf_path=urdf, explicit_derivatives=False),
        "plain jacfwd": make_rbd_arm_problem(
            target_pose=target, urdf_path=urdf, analytic_jacobians=False),
    }
    p0 = problems["explicit dRNEA (r5)"]
    n, m = p0.state_dim, p0.control_dim
    print(f"device={jax.devices()[0]} 6Dof_arm n={n} m={m} B={B} T={T} "
          f"scalar_algebra={use_scalar_algebra(__import__('ilqr_tpu.models.rbd.urdf', fromlist=['parse_urdf']).parse_urdf(urdf, floating=True))}",
          flush=True)

    key = jax.random.PRNGKey(0)
    nominal = jnp.zeros(n, dtype).at[2].set(1.0)
    x0_bl = (nominal[None, :]
             + 0.02 * jax.random.normal(key, (B, n), dtype)).T
    us_bl = 0.01 * jax.random.normal(key, (T, m, B), dtype)
    roll = jax.jit(highest_precision(lambda a, b: bl.rollout_bl(p0, a, b)))
    t0 = time.perf_counter()
    xs_bl = jax.block_until_ready(roll(x0_bl, us_bl))
    print(f"  rollout compile+run {time.perf_counter()-t0:.1f}s", flush=True)

    for tag, problem in problems.items():
        def run(xs, us, problem=problem):
            def body(_, xs):
                out = bl.derivatives_bl(problem, xs, us)
                s = sum(jnp.sum(o) for o in out)
                return xs + 1e-20 * s
            return jax.lax.fori_loop(0, REPS, body, xs)

        jf = jax.jit(highest_precision(run))
        t0 = time.perf_counter()
        out = jax.block_until_ready(jf(xs_bl, us_bl))
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            out = jax.block_until_ready(jf(xs_bl, us_bl))
            ts.append(time.perf_counter() - t0)
        print(f"  deriv sweep {tag:24s} {min(ts)/REPS*1e3:9.2f} ms/app "
              f"(compile {compile_s:.0f}s)", flush=True)

    if args.solve:
        from ilqr_tpu.config import ILQRConfig, Status
        from ilqr_tpu.parallel.batching import make_batch_solver

        config = ILQRConfig(max_iter=15, tol=1e-5, tol_grad=1e-10,
                            tol_grad_rel=1e-6, adaptive_reg=True, reg=1.0,
                            reg_min=1e-3, reg_scale=10.0,
                            reg_backtrack_trigger=1,
                            backward_backend="scan", scan_unroll=1)
        solve_fn = make_batch_solver(p0, config, engine="fused")
        x0s = nominal + 0.02 * jax.random.normal(key, (B, n), dtype)
        us0 = jnp.zeros((B, T, m), dtype)
        t0 = time.perf_counter()
        r = jax.block_until_ready(solve_fn(x0s, us0))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        r = jax.block_until_ready(solve_fn(x0s, us0))
        solve_s = time.perf_counter() - t0
        n_conv = int(jnp.sum(r.status == int(Status.CONVERGED)))
        print(f"  solve B={B} T={T} 15 iters: {solve_s:.2f}s "
              f"(compile {compile_s:.0f}s) converged={n_conv}/{B} "
              f"mean_iters={float(jnp.mean(r.iterations)):.1f}", flush=True)


if __name__ == "__main__":
    main()

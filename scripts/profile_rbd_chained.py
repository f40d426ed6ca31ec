"""RBD phase times via the CHAINED methodology (the only trustworthy one
through this environment's async remote tunnel — single-dispatch timings
flip between real and ~0.05 ms phantom values; see bench_logs/r4).

Each phase is applied REPS times inside ONE jit with a data dependence
between applications; reported per-application time = total / REPS.

    python scripts/profile_rbd_chained.py [--T 100] [--batch 1024]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

REPS = 8


def measure(f, *args, repeats=3):
    t0 = time.perf_counter()
    out = jax.block_until_ready(f(*args))
    c = time.perf_counter() - t0
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = jax.block_until_ready(f(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts), c


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--T", type=int, default=100)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_default_device", jax.devices("cpu")[0])

    from ilqr_tpu import batched as bl
    from ilqr_tpu.config import ILQRConfig
    from ilqr_tpu.models.rbd.model import make_rbd_arm_problem
    from ilqr_tpu.precision import highest_precision

    T, B = args.T, args.batch
    n, m = 16, 8
    dtype = jnp.float32
    p_cust = make_rbd_arm_problem(explicit_derivatives=True)
    p_jvp = make_rbd_arm_problem(explicit_derivatives=False)
    p_ad = make_rbd_arm_problem(analytic_jacobians=False)
    p_plain = make_rbd_arm_problem(analytic_jacobians=False,
                                   analytic_derivatives=False)
    config = ILQRConfig(backward_backend="scan", scan_unroll=1)

    key = jax.random.PRNGKey(0)
    nominal = jnp.asarray(
        [0.0, 0.0, 1.0, 0.5, 0.75, 1.0, 0.0, 0.0] + [0.0] * 8, dtype)
    x0_bl = (nominal[None, :]
             + 0.02 * jax.random.normal(key, (B, n), dtype)).T
    us_bl = 0.01 * jax.random.normal(key, (T, m, B), dtype)
    roll = jax.jit(highest_precision(
        lambda a, b: bl.rollout_bl(p_ad, a, b)))
    xs_bl = jax.block_until_ready(roll(x0_bl, us_bl))

    def bench(tag, f):
        jf = jax.jit(highest_precision(f))
        best, c = measure(jf, xs_bl, us_bl)
        print(f"  {tag:44s} {best/REPS*1e3:9.2f} ms/app (compile {c:.0f}s)",
              flush=True)

    print(f"device={jax.devices()[0]} T={T} B={B} reps={REPS}", flush=True)

    def deriv_chain(problem):
        def run(xs, us):
            def body(_, xs):
                out = bl.derivatives_bl(problem, xs, us)
                # force every output into the feedback so nothing is DCEd
                s = sum(jnp.sum(o) for o in out)
                return xs + 1e-20 * s
            return jax.lax.fori_loop(0, REPS, body, xs)
        return run

    bench("derivatives_bl, explicit dRNEA (r5)", deriv_chain(p_cust))
    bench("derivatives_bl, custom jacobians (JVP replay)",
          deriv_chain(p_jvp))
    bench("derivatives_bl, jacfwd + analytic JVP", deriv_chain(p_ad))
    bench("derivatives_bl, plain AD", deriv_chain(p_plain))

    def jac_chain(problem):
        if problem.dynamics_jacobians is not None:
            jac_b = jax.vmap(problem.dynamics_jacobians,
                             in_axes=(-1, -1), out_axes=-1)
        else:
            jac = jax.jacfwd(problem.dynamics, argnums=(0, 1))
            jac_b = jax.vmap(jac, in_axes=(-1, -1), out_axes=-1)

        def run(xs, us):
            def body(_, xs):
                A, Bm = jax.vmap(jac_b)(xs[:-1], us)
                s = jnp.sum(A) + jnp.sum(Bm)
                return xs + 1e-20 * s
            return jax.lax.fori_loop(0, REPS, body, xs)
        return run

    bench("dyn jacobians only, explicit dRNEA (r5)", jac_chain(p_cust))
    bench("dyn jacobians only, custom (JVP replay)", jac_chain(p_jvp))
    bench("dyn jacobians only, jacfwd+JVP", jac_chain(p_ad))

    def riccati_chain(xs, us):
        models = bl.derivatives_bl(p_cust, xs, us)
        reg = jnp.full((B,), 1.0, dtype)

        def body(_, mo):
            duffs, Ks, dv1, dv2 = bl.riccati_bl(*mo, reg=reg, config=config)
            return mo[:7] + (mo[7] + 1e-20 * dv1[None, :], mo[8])
        out = jax.lax.fori_loop(0, REPS, body, models)
        return out[7]

    bench("riccati_bl scan", riccati_chain)

    def rollout_chain(xs, us):
        duffs = jnp.zeros_like(us)
        Ks = jnp.zeros((T, m, n, B), dtype)
        alpha = jnp.full((B,), 0.5, dtype)

        def body(_, xs):
            xs2, us2 = bl.closed_loop_rollout_bl(p_cust, xs, us, duffs, Ks,
                                                 alpha)
            return xs2
        return jax.lax.fori_loop(0, REPS, body, xs)

    bench("closed_loop_rollout_bl (1 rung)", rollout_chain)

    def cost_chain(xs, us):
        def body(_, xs):
            steps, fin = bl.step_costs_bl(p_cust, xs, us)
            return xs + 1e-20 * (jnp.sum(steps) + jnp.sum(fin))
        return jax.lax.fori_loop(0, REPS, body, xs)

    bench("step_costs_bl", cost_chain)


if __name__ == "__main__":
    main()

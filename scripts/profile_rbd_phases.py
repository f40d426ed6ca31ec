"""RBD phase profiler: time the three phases of a fused batched iLQR
iteration on the floating-base arm — derivative sweep, Riccati backward,
closed-loop rollout — plus the derivative sweep's internal split
(dynamics jacobians vs cost quadratization).

Runs anywhere (CPU for iteration speed, TPU for truth; JAX_PLATFORMS is
ignored where the TPU platform self-registers, hence --cpu):

    python scripts/profile_rbd_phases.py --cpu --batch 16 --T 50
    python scripts/profile_rbd_phases.py --batch 256 --T 100   # chip
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(name, f, *args, repeats=3):
    t0 = time.perf_counter()
    r = jax.block_until_ready(f(*args))
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        r = jax.block_until_ready(f(*args))
        ts.append(time.perf_counter() - t0)
    print(f"  {name:<36s} {min(ts)*1e3:9.2f} ms  (compile {compile_s:.1f}s)",
          flush=True)
    return r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--T", type=int, default=50)
    ap.add_argument("--no-analytic", action="store_true")
    ap.add_argument("--chunk", type=int, default=0)
    ap.add_argument("--cpu", action="store_true",
                    help="pin to the host CPU backend")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_default_device", jax.devices("cpu")[0])

    from ilqr_tpu import batched as bl
    from ilqr_tpu.config import ILQRConfig
    from ilqr_tpu.models.rbd.model import make_rbd_arm_problem

    problem = make_rbd_arm_problem(
        analytic_derivatives=not args.no_analytic)
    config = ILQRConfig(backward_backend="scan", scan_unroll=1,
                        derivative_chunk=args.chunk)
    B, T = args.batch, args.T
    n, m = 16, 8
    dtype = jnp.float32

    key = jax.random.PRNGKey(0)
    nominal = jnp.asarray(
        [0.0, 0.0, 1.0, 0.5, 0.75, 1.0, 0.0, 0.0] + [0.0] * 8, dtype)
    x0s = (nominal + 0.02 * jax.random.normal(key, (B, n), dtype)).T
    us = 0.01 * jax.random.normal(key, (T, m, B), dtype)

    print(f"device={jax.devices()[0]} B={B} T={T} "
          f"analytic={not args.no_analytic} chunk={args.chunk}", flush=True)

    roll = jax.jit(lambda x0, us: bl.rollout_bl(problem, x0, us))
    xs = timeit("rollout_bl (open loop)", roll, x0s, us)

    deriv = jax.jit(lambda xs, us: bl.derivatives_bl(
        problem, xs, us, chunk=config.derivative_chunk))
    models = timeit("derivatives_bl (full sweep)", deriv, xs, us)

    # Split: dynamics jacobians only vs cost quadratization only.
    def jac_only(xs, us):
        jac = jax.jacfwd(problem.dynamics, argnums=(0, 1))
        jac_b = jax.vmap(jac, in_axes=(-1, -1), out_axes=-1)
        return jax.vmap(jac_b)(xs[:-1], us)

    timeit("  dynamics jacobians only", jax.jit(jac_only), xs, us)

    reg = jnp.full((B,), 1.0, dtype)
    ric = jax.jit(lambda *mo: bl.riccati_bl(*mo, reg=reg, config=config))
    duffs, Ks, dv1, dv2 = timeit("riccati_bl (scan)", ric, *models)

    clr = jax.jit(lambda xs, us, duffs, Ks: bl.closed_loop_rollout_bl(
        problem, xs, us, duffs, Ks, jnp.full((B,), 0.5, dtype)))
    timeit("closed_loop_rollout_bl (1 rung)", clr, xs, us, duffs, Ks)

    if problem.dynamics_jacobians is not None:
        def cust(xs, us):
            jac_b = jax.vmap(problem.dynamics_jacobians,
                             in_axes=(-1, -1), out_axes=-1)
            return jax.vmap(jac_b)(xs[:-1], us)

        timeit("custom dynamics_jacobians", jax.jit(cust), xs, us)


if __name__ == "__main__":
    main()

"""Bisect the RBD dynamics-jacobian cost: which piece of the per-stage
computation eats the time at sweep scale?

    python scripts/microbench_rbd_stages.py [--T 100] [--batch 1024]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


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

    from ilqr_tpu.models.rbd.dynamics import (
        crba_mass_matrix,
        forward_dynamics,
        make_forward_dynamics_analytic_jvp,
        rnea_bias,
    )
    from ilqr_tpu.models.rbd.model import (
        TWO_DOF_ARM_URDF,
        make_rbd_continuous_dynamics,
        make_rbd_dynamics,
        make_rbd_dynamics_jacobians,
    )
    from ilqr_tpu.models.rbd.urdf import parse_urdf
    from ilqr_tpu.ops.linalg import cholesky_small
    from ilqr_tpu.precision import highest_precision

    mech = parse_urdf(TWO_DOF_ARM_URDF, floating=True,
                      gravity=(0.0, 0.0, 0.0))
    T, B = args.T, args.batch
    n, m = 2 * mech.nv, mech.nv
    nq = mech.nq
    key = jax.random.PRNGKey(0)
    x = 0.2 * jax.random.normal(key, (T, B, n), jnp.float32)
    u = 0.2 * jax.random.normal(key, (T, B, m), jnp.float32)
    q = 0.2 * jax.random.normal(key, (T, B, nq), jnp.float32)
    v = 0.2 * jax.random.normal(key, (T, B, m), jnp.float32)

    def bench(tag, f, *arrs):
        bf = jax.jit(highest_precision(
            lambda *a: jax.vmap(jax.vmap(f))(*a)))
        best, c = measure(bf, *arrs)
        print(f"  {tag:40s} {best*1e3:9.2f} ms  (compile {c:.1f}s)",
              flush=True)

    print(f"device={jax.devices()[0]} T={T} B={B}", flush=True)

    bench("crba_mass_matrix", lambda q1: crba_mass_matrix(mech, q1), q)
    bench("crba + cholesky_small",
          lambda q1: cholesky_small(crba_mass_matrix(mech, q1)), q)
    bench("rnea_bias", lambda q1, v1: rnea_bias(mech, q1, v1), q, v)
    bench("forward_dynamics (primal)",
          lambda q1, v1, u1: forward_dynamics(mech, q1, v1, u1), q, v, u)

    fd = make_forward_dynamics_analytic_jvp(mech)
    bench("fd analytic (primal only)", lambda q1, v1, u1: fd(q1, v1, u1),
          q, v, u)

    # fd 16-tangent jacobian (state part of ONE stage).
    f_c = make_rbd_continuous_dynamics(mech)
    bench("f_c (continuous dynamics, primal)", f_c, x, u)
    jac_fc = jax.jacfwd(f_c, argnums=0)
    bench("jacfwd(f_c) wrt x [1 stage]", jac_fc, x, u)

    dyn = make_rbd_dynamics(mech)
    bench("rk4 dynamics (primal)", dyn, x, u)
    jac_full = jax.jacfwd(dyn, argnums=(0, 1))
    bench("jacfwd(rk4) full 24 tangents", jac_full, x, u)

    jac_cust = make_rbd_dynamics_jacobians(mech)
    bench("custom dynamics_jacobians", jac_cust, x, u)


if __name__ == "__main__":
    main()

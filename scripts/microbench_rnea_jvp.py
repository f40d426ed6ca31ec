"""Measure the achieved throughput of the RNEA-JVP tangent sweep — the
inner loop of the RBD derivative phase — at sweep scale.

    python scripts/microbench_rnea_jvp.py [--T 100] [--batch 1024]
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
    ap.add_argument("--tangents", type=int, default=16)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_default_device", jax.devices("cpu")[0])

    from ilqr_tpu.models.rbd.dynamics import rnea_inverse_dynamics
    from ilqr_tpu.models.rbd.model import TWO_DOF_ARM_URDF
    from ilqr_tpu.models.rbd.urdf import parse_urdf
    from ilqr_tpu.precision import highest_precision

    mech = parse_urdf(TWO_DOF_ARM_URDF, floating=True,
                      gravity=(0.0, 0.0, 0.0))
    T, B, K = args.T, args.batch, args.tangents
    nq, nv = mech.nq, mech.nv
    key = jax.random.PRNGKey(0)
    q = 0.2 * jax.random.normal(key, (T, B, nq), jnp.float32)
    v = 0.2 * jax.random.normal(key, (T, B, nv), jnp.float32)
    a = 0.2 * jax.random.normal(key, (T, B, nv), jnp.float32)
    dq = jax.random.normal(key, (T, B, K, nq), jnp.float32)
    dv = jax.random.normal(key, (T, B, K, nv), jnp.float32)

    @highest_precision
    def primal(q, v, a):
        f = lambda q1, v1, a1: rnea_inverse_dynamics(mech, q1, v1, a1)
        return jax.vmap(jax.vmap(f))(q, v, a)

    @highest_precision
    def sweep(q, v, a, dq, dv):
        def one(q1, v1, a1, dq1, dv1):
            def jvp_k(dqk, dvk):
                return jax.jvp(
                    lambda qq, vv: rnea_inverse_dynamics(mech, qq, vv, a1),
                    (q1, v1), (dqk, dvk))[1]
            return jax.vmap(jvp_k)(dq1, dv1)
        return jax.vmap(jax.vmap(one))(q, v, a, dq, dv)

    print(f"device={jax.devices()[0]} T={T} B={B} K={K}", flush=True)
    best, c = measure(jax.jit(primal), q, v, a)
    evals = T * B
    print(f"  primal RNEA        {best*1e3:8.2f} ms  "
          f"({evals/best/1e6:.1f} M evals/s)  compile {c:.1f}s", flush=True)
    best, c = measure(jax.jit(sweep), q, v, a, dq, dv)
    evals = T * B * K
    print(f"  {K}-tangent JVP     {best*1e3:8.2f} ms  "
          f"({evals/best/1e6:.1f} M tangent-evals/s)  compile {c:.1f}s",
          flush=True)


if __name__ == "__main__":
    main()

"""Phase attribution at the reference-scale RBD bench config
(B=256, T=1000, n=16, m=8) — chained-in-jit, the only methodology this
tunnel respects.  Answers: of the ~1.0 s/pass bulk cost (round-5
compaction timeline), how much is derivative sweep vs ladder rollout vs
backward vs cost evaluation?

    JAX_COMPILATION_CACHE_DIR=.jax_cache python scripts/profile_rbd_T1000.py
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

REPS = 4


def measure(f, *args, repeats=2):
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
    ap.add_argument("--T", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=256)
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
    problem = make_rbd_arm_problem()
    # The bench's solver config (bench.py --config rbd).
    config = ILQRConfig(backward_backend="pallas", scan_unroll=1,
                        derivative_chunk=100, adaptive_reg=True, reg=1.0,
                        reg_min=1e-3, reg_scale=10.0,
                        reg_backtrack_trigger=1)

    key = jax.random.PRNGKey(0)
    nominal = jnp.asarray(
        [0.0, 0.0, 1.0, 0.5, 0.75, 1.0, 0.0, 0.0] + [0.0] * 8, dtype)
    x0_bl = (nominal[None, :]
             + 0.02 * jax.random.normal(key, (B, n), dtype)).T
    us_bl = 0.01 * jax.random.normal(key, (T, m, B), dtype)
    roll = jax.jit(highest_precision(
        lambda a, b: bl.rollout_bl(problem, a, b, unroll=1)))
    t0 = time.perf_counter()
    xs_bl = jax.block_until_ready(roll(x0_bl, us_bl))
    print(f"device={jax.devices()[0]} T={T} B={B} reps={REPS} "
          f"(open-loop rollout compile {time.perf_counter()-t0:.0f}s)",
          flush=True)

    def bench(tag, f):
        jf = jax.jit(highest_precision(f))
        try:
            best, c = measure(jf, xs_bl, us_bl)
            print(f"  {tag:42s} {best/REPS*1e3:9.1f} ms/app "
                  f"(compile {c:.0f}s)", flush=True)
        except Exception as e:
            print(f"  {tag:42s} FAILED {type(e).__name__}: {str(e)[:100]}",
                  flush=True)

    # Derivative sweep as the bench runs it (chunked) and whole-horizon.
    for chunk, tag in ((100, "deriv sweep (lax.map chunk=100, as bench)"),
                      (0, "deriv sweep (whole horizon)")):
        def deriv(xs, us, chunk=chunk):
            def body(_, xs):
                out = bl.derivatives_bl(problem, xs, us, chunk=chunk)
                s = sum(jnp.sum(o) for o in out)
                return xs + 1e-20 * s
            return jax.lax.fori_loop(0, REPS, body, xs)
        bench(tag, deriv)

    # One ladder rung: closed-loop rollout + exact cost evaluation.
    def rung(xs, us):
        duffs = jnp.zeros_like(us)
        Ks = jnp.zeros((T, m, n, B), dtype)
        alpha = jnp.full((B,), 0.5, dtype)

        def body(_, xs):
            xs2, us2 = bl.closed_loop_rollout_bl(problem, xs, us, duffs, Ks,
                                                 alpha, unroll=1)
            c = bl.total_cost_bl(problem, xs2, us2, None)
            return xs2 + 1e-20 * c[None, None, :]
        return jax.lax.fori_loop(0, REPS, body, xs)
    bench("ladder rung (closed-loop rollout + cost)", rung)

    def rollout_only(xs, us):
        duffs = jnp.zeros_like(us)
        Ks = jnp.zeros((T, m, n, B), dtype)
        alpha = jnp.full((B,), 0.5, dtype)

        def body(_, xs):
            xs2, _ = bl.closed_loop_rollout_bl(problem, xs, us, duffs, Ks,
                                               alpha, unroll=1)
            return xs2
        return jax.lax.fori_loop(0, REPS, body, xs)
    bench("closed-loop rollout only", rollout_only)

    # Backward (pallas) on precomputed models.
    def backward(xs, us):
        models = bl.derivatives_bl(problem, xs, us,
                                   chunk=config.derivative_chunk)
        reg = jnp.full((B,), 1.0, dtype)

        def body(_, mo):
            duffs, Ks, dv1, dv2 = bl.riccati_bl(*mo, reg=reg, config=config)
            return mo[:7] + (mo[7] + 1e-20 * dv1[None, :], mo[8])
        out = jax.lax.fori_loop(0, REPS, body, models)
        return out[7]
    bench("backward (pallas kernel)", backward)

    # Cost evaluation alone (the ladder's per-rung acceptance input).
    def costs(xs, us):
        def body(_, xs):
            c = bl.total_cost_bl(problem, xs, us, None)
            return xs + 1e-20 * c[None, None, :]
        return jax.lax.fori_loop(0, REPS, body, xs)
    bench("total cost eval", costs)


if __name__ == "__main__":
    main()

"""Decompose the fused solver's per-iteration cost on the real chip.

The round-3 roofline (BENCH.md) accounts ~5-8 ms/iteration of phase time
at B=4096/T=100 (derivatives 1.2 + backward 1.4 + rollout 2.6 + cost),
yet the full solve measures ~32 ms per mean iteration.  This script
isolates where the rest goes by timing `batched_solve_fused` under
controlled configs:

* fixed iteration counts (tol=0, no stationarity gate, max_backtracks=1)
  -> marginal cost per iteration without ladder or early-exit effects;
* max_backtracks 1 vs default 32 -> ladder overhead;
* with/without the stationarity gate -> gate cost;
* the production config -> reference point (matches bench.py).

Run (TPU): JAX_COMPILATION_CACHE_DIR=.jax_cache python scripts/profile_solve_iter.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def measure(f, *args, repeats=3):
    out = jax.block_until_ready(f(*args))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = jax.block_until_ready(f(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def main():
    from ilqr_tpu.batched import batched_solve_fused
    from ilqr_tpu.config import ILQRConfig
    from ilqr_tpu.models.two_link import make_two_link_problem
    from ilqr_tpu.problem import rollout

    B, T = 4096, 100
    dtype = jnp.float32
    problem = make_two_link_problem()
    key = jax.random.PRNGKey(0)
    nominal = jnp.asarray([0.3, 0.7, 0.2, 0.5], dtype)
    x0s = nominal + 0.1 * jax.random.normal(key, (B, 4), dtype)
    us0 = jnp.zeros((B, T, 2), dtype)
    roll = jax.jit(jax.vmap(lambda x0, us: rollout(problem.dynamics, x0, us)))
    xs0 = jax.block_until_ready(roll(x0s, us0))

    print(f"device: {jax.devices()[0]}  B={B} T={T}", flush=True)

    def run(tag, **kw):
        config = ILQRConfig(**kw)
        f = jax.jit(lambda a, b: batched_solve_fused(problem, a, b,
                                                     config=config))
        t0 = time.perf_counter()
        jax.block_until_ready(f(xs0, us0))
        compile_s = time.perf_counter() - t0
        best, out = measure(f, xs0, us0)
        mean_it = float(jnp.mean(out.iterations.astype(jnp.float32)))
        print(f"{tag:42s} {best*1e3:9.1f} ms  mean_iters={mean_it:5.1f} "
              f"(compile {compile_s:.0f}s)", flush=True)
        return best

    # Fixed-iteration marginal cost: force every lane to run exactly k
    # iterations, single-rung ladder, no gates.
    base = dict(tol=0.0, tol_grad=0.0, tol_grad_rel=0.0, max_backtracks=1)
    t2 = run("fixed 2 iters, 1-rung ladder", max_iter=2, **base)
    t4 = run("fixed 4 iters, 1-rung ladder", max_iter=4, **base)
    t8 = run("fixed 8 iters, 1-rung ladder", max_iter=8, **base)
    print(f"  -> marginal per-iteration: {(t8 - t4) / 4 * 1e3:.2f} ms "
          f"({(t4 - t2) / 2 * 1e3:.2f} ms from 2->4)", flush=True)

    # Ladder depth effect at fixed iterations.
    run("fixed 8 iters, 32-rung ladder", max_iter=8, tol=0.0,
        tol_grad=0.0, tol_grad_rel=0.0, max_backtracks=32)

    # Stationarity gate cost at fixed iterations.
    run("fixed 8 iters, 1-rung + gate", max_iter=8, tol=0.0,
        tol_grad=1e-10, tol_grad_rel=1e-6, max_backtracks=1)

    # Production config (bench.py headline).
    run("production (tol=1e-5, gate, 32-rung)", max_iter=30, tol=1e-5,
        tol_grad=1e-10, tol_grad_rel=1e-6)


if __name__ == "__main__":
    main()

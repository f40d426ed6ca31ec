"""Phase profiler: time each stage of the fused batched iLQR iteration on
the current default device (TPU).  Diagnostics only — not part of bench.py.

    python scripts/profile_phases.py [--batch 4096] [--T 100]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(name, f, *args, repeats=5):
    r = jax.block_until_ready(f(*args))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        r = jax.block_until_ready(f(*args))
        ts.append(time.perf_counter() - t0)
    print(f"  {name:<28s} {min(ts)*1e3:8.2f} ms")
    return r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--T", type=int, default=100)
    args = ap.parse_args()

    from ilqr_tpu import batched as bl
    from ilqr_tpu.config import ILQRConfig
    from ilqr_tpu.models.two_link import make_two_link_problem

    problem = make_two_link_problem()
    config = ILQRConfig(backward_backend="pallas", scan_unroll=8)
    B, T = args.batch, args.T
    dtype = jnp.float32

    key = jax.random.PRNGKey(0)
    nominal = jnp.asarray([0.3, 0.7, 0.2, 0.5], dtype)
    x0s = (nominal + 0.1 * jax.random.normal(key, (B, 4), dtype)).T  # [n, B]
    us = jnp.zeros((T, 2, B), dtype)

    print(f"device={jax.devices()[0]} B={B} T={T}")

    roll = jax.jit(lambda x0, u: bl.rollout_bl(problem, x0, u,
                                               unroll=config.scan_unroll))
    xs = timeit("open-loop rollout", roll, x0s, us)

    deriv = jax.jit(lambda a, b: bl.derivatives_bl(problem, a, b))
    models = timeit("derivatives (lin+quad)", deriv, xs, us)

    reg = jnp.full((B,), config.reg, dtype)

    def bwd_pallas(models, reg):
        cfg = config
        return bl.riccati_bl(*models, reg=reg, config=cfg)

    duffs, Ks, dv1, dv2 = timeit("backward (pallas)", jax.jit(bwd_pallas),
                                 models, reg)

    def bwd_scan(models, reg):
        cfg = config.replace(backward_backend="scan")
        return bl.riccati_bl(*models, reg=reg, config=cfg)

    timeit("backward (bl scan u=8)", jax.jit(bwd_scan), models, reg)

    alpha = jnp.ones((B,), dtype)
    clr = jax.jit(lambda xs, us, duffs, Ks, alpha: bl.closed_loop_rollout_bl(
        problem, xs, us, duffs, Ks, alpha, unroll=config.scan_unroll))
    timeit("closed-loop rollout (1 alpha)", clr, xs, us, duffs, Ks, alpha)

    tc = jax.jit(lambda xs, us: bl.total_cost_bl(problem, xs, us))
    prev_cost = timeit("total cost", tc, xs, us)

    fp = jax.jit(lambda xs, us, duffs, Ks, prev_cost: bl.forward_pass_bl(
        problem, xs, us, duffs, Ks, prev_cost, None, config))
    timeit("forward pass (line search)", fp, xs, us, duffs, Ks, prev_cost)

    full = jax.jit(lambda x, u: bl.batched_solve_fused(
        problem,
        jnp.moveaxis(bl.rollout_bl(problem, x, u, unroll=config.scan_unroll),
                     -1, 0),
        jnp.moveaxis(u, -1, 0), config=config.replace(max_iter=30, tol=1e-5,
                                                      tol_grad=1e-10)))
    r = timeit("FULL solve (to conv)", full, x0s, us, repeats=3)
    print(f"  mean iters {float(jnp.mean(r.iterations)):.2f}  "
          f"statuses {[int(jnp.sum(r.status == s)) for s in range(4)]}")


if __name__ == "__main__":
    main()

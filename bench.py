"""Benchmark harness.

Default (driver) mode prints ONE JSON line for the headline metric:
batched iLQR solves/s per chip on the 2-link model (BASELINE.md: >= 10,000
converged solves/s on a v5e-16 → 625 solves/s/chip; ``vs_baseline`` is
measured / 625).

Extra configs (BASELINE.json) via ``--config``:

  batched       4096 scenarios, T=100, solve to convergence   [default]
  long_horizon  T=1000 single+batched solve (scan vs associative backend)
  mpc           single-scenario receding-horizon p50 latency (50 replans)
  single        one solve latency, T=100

Diagnostics go to stderr; the JSON line is the last stdout line.
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp


def _time(f, *args, repeats=3):
    r = jax.block_until_ready(f(*args))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        r = jax.block_until_ready(f(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts), r


def bench_batched(batch=4096, T=100, max_iter=30, tol=1e-5,
                  backend="pallas", engine="fused", dtype=jnp.float32,
                  tol_grad=1e-10, tol_grad_rel=1e-6, adaptive_reg=False):
    from ilqr_tpu.config import ILQRConfig, Status
    from ilqr_tpu.models.two_link import make_two_link_problem
    from ilqr_tpu.parallel.batching import make_batch_solver

    problem = make_two_link_problem()
    config = ILQRConfig(max_iter=max_iter, tol=tol, tol_grad=tol_grad,
                        tol_grad_rel=tol_grad_rel, adaptive_reg=adaptive_reg,
                        backward_backend=backend)
    solve_fn = make_batch_solver(problem, config, engine=engine)

    key = jax.random.PRNGKey(0)
    nominal = jnp.asarray([0.3, 0.7, 0.2, 0.5], dtype)
    x0s = nominal + 0.1 * jax.random.normal(key, (batch, 4), dtype)
    us0 = jnp.zeros((batch, T, 2), dtype)

    t0 = time.perf_counter()
    result = jax.block_until_ready(solve_fn(x0s, us0))
    compile_s = time.perf_counter() - t0
    best, result = _time(solve_fn, x0s, us0)

    n_conv = int(jnp.sum(result.status == int(Status.CONVERGED)))
    mean_iters = float(jnp.mean(result.iterations.astype(jnp.float32)))
    print(
        f"[bench:batched backend={backend} engine={engine}] device={jax.devices()[0]} "
        f"batch={batch} T={T} compile={compile_s:.1f}s best={best*1e3:.1f}ms "
        f"converged={n_conv}/{batch} mean_iters={mean_iters:.1f}",
        file=sys.stderr,
    )
    return batch / best


def bench_single(T=100, max_iter=30, backend="scan", dtype=jnp.float32):
    from ilqr_tpu.config import ILQRConfig
    from ilqr_tpu.models.two_link import make_two_link_problem
    from ilqr_tpu.problem import rollout
    from ilqr_tpu.solver import solve

    problem = make_two_link_problem()
    config = ILQRConfig(max_iter=max_iter, tol=1e-5, tol_grad=1e-10,
                        backward_backend=backend)
    x0 = jnp.asarray([0.1, -0.1, 0.0, 0.0], dtype)
    us0 = jnp.zeros((T, 2), dtype)
    xs0 = rollout(problem.dynamics, x0, us0)
    f = jax.jit(lambda a, b: solve(problem, a, b, config=config))
    best, r = _time(f, xs0, us0)
    print(f"[bench:single backend={backend}] T={T} latency={best*1e3:.2f}ms "
          f"iters={int(r.iterations)} status={int(r.status)}", file=sys.stderr)
    return best


def bench_long_horizon(T=1000, batch=256, dtype=jnp.float32):
    vals = {}
    for backend in ("scan", "associative"):
        try:
            vals[backend] = bench_batched(batch=batch, T=T, max_iter=15,
                                          backend=backend)
        except Exception as e:  # pragma: no cover
            print(f"[bench:long_horizon] {backend} failed: {e}",
                  file=sys.stderr)
    for k, v in vals.items():
        print(f"[bench:long_horizon] {k}: {v:.1f} solves/s", file=sys.stderr)
    return max(vals.values())


def bench_mpc(horizon=50, n_steps=50, dtype=jnp.float32):
    from ilqr_tpu.config import ILQRConfig
    from ilqr_tpu.parallel.mpc import mpc_run

    from ilqr_tpu.models.two_link import make_two_link_problem

    problem = make_two_link_problem()
    config = ILQRConfig(max_iter=10, tol=1e-5, tol_grad=1e-10)
    x0 = jnp.asarray([0.1, -0.1, 0.0, 0.0], dtype)
    f = jax.jit(lambda x: mpc_run(problem, x, horizon, n_steps, config))
    best, r = _time(f, x0)
    per_replan = best / n_steps
    print(f"[bench:mpc] horizon={horizon} n_steps={n_steps} "
          f"total={best*1e3:.1f}ms per_replan={per_replan*1e3:.2f}ms "
          f"mean_iters={float(jnp.mean(r.iterations.astype(jnp.float32))):.1f}",
          file=sys.stderr)
    return per_replan


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="batched",
                    choices=["batched", "long_horizon", "mpc", "single"])
    ap.add_argument("--backend", default="pallas",
                    choices=["scan", "associative", "pallas"])
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--engine", default="fused", choices=["vmap", "fused"])
    ap.add_argument("--tol-grad", type=float, default=1e-10)
    ap.add_argument("--tol-grad-rel", type=float, default=1e-6)
    ap.add_argument("--adaptive-reg", action="store_true")
    args = ap.parse_args()

    baseline_per_chip = 10000.0 / 16.0  # BASELINE.md: 10k solves/s on v5e-16

    if args.config == "batched":
        value = bench_batched(batch=args.batch, backend=args.backend,
                              engine=args.engine, tol_grad=args.tol_grad,
                              tol_grad_rel=args.tol_grad_rel,
                              adaptive_reg=args.adaptive_reg)
        print(json.dumps({
            "metric": "ilqr_solves_per_s_per_chip_2link_N100",
            "value": round(value, 2),
            "unit": "solves/s",
            "vs_baseline": round(value / baseline_per_chip, 3),
        }))
    elif args.config == "single":
        value = bench_single(backend=args.backend)
        print(json.dumps({
            "metric": "ilqr_single_solve_latency_2link_N100",
            "value": round(value * 1e3, 3),
            "unit": "ms",
            "vs_baseline": None,
        }))
    elif args.config == "long_horizon":
        value = bench_long_horizon()
        print(json.dumps({
            "metric": "ilqr_solves_per_s_2link_N1000",
            "value": round(value, 2),
            "unit": "solves/s",
            "vs_baseline": None,
        }))
    elif args.config == "mpc":
        value = bench_mpc()
        print(json.dumps({
            "metric": "mpc_replan_latency_p50_2link_H50",
            "value": round(value * 1e3, 3),
            "unit": "ms",
            "vs_baseline": None,
        }))


if __name__ == "__main__":
    main()

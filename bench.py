"""Benchmark harness: batched iLQR solves/s per chip on the 2-link model.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline (BASELINE.md): >= 10,000 converged iLQR solves/s on a v5e-16
(16 chips) for the 2-link swing-up at horizon N=100 → 625 solves/s/chip.
``vs_baseline`` is measured-solves-per-chip / 625.

Each "solve" runs the full iLQR loop to convergence (tol, bounded
iterations) from a randomly perturbed initial state — the scenario-batched
workload of BASELINE.json config 4.  Diagnostics go to stderr.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


def run_bench(batch=4096, T=100, max_iter=30, tol=1e-5, repeats=3,
              dtype=jnp.float32):
    from ilqr_tpu.config import ILQRConfig, Status
    from ilqr_tpu.models.two_link import make_two_link_problem
    from ilqr_tpu.parallel.batching import make_batch_solver

    problem = make_two_link_problem()
    config = ILQRConfig(max_iter=max_iter, tol=tol, tol_grad=1e-10)
    solve_fn = make_batch_solver(problem, config)

    key = jax.random.PRNGKey(0)
    nominal = jnp.asarray([0.3, 0.7, 0.2, 0.5], dtype)
    x0s = nominal + 0.1 * jax.random.normal(key, (batch, 4), dtype)
    us0 = jnp.zeros((batch, T, 2), dtype)

    # Warmup / compile.
    t0 = time.perf_counter()
    result = solve_fn(x0s, us0)
    jax.block_until_ready(result.us)
    compile_s = time.perf_counter() - t0

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        result = solve_fn(x0s, us0)
        jax.block_until_ready(result.us)
        times.append(time.perf_counter() - t0)
    best = min(times)

    n_conv = int(jnp.sum(result.status == int(Status.CONVERGED)))
    mean_iters = float(jnp.mean(result.iterations.astype(jnp.float32)))
    solves_per_s = batch / best

    print(
        f"[bench] device={jax.devices()[0]} batch={batch} T={T} "
        f"compile={compile_s:.1f}s best={best*1e3:.1f}ms "
        f"converged={n_conv}/{batch} mean_iters={mean_iters:.1f} "
        f"times={[f'{t*1e3:.0f}ms' for t in times]}",
        file=sys.stderr,
    )
    return solves_per_s


def main():
    baseline_per_chip = 10000.0 / 16.0  # BASELINE.md: 10k solves/s on v5e-16
    value = run_bench()
    print(json.dumps({
        "metric": "ilqr_solves_per_s_per_chip_2link_N100",
        "value": round(value, 2),
        "unit": "solves/s",
        "vs_baseline": round(value / baseline_per_chip, 3),
    }))


if __name__ == "__main__":
    main()

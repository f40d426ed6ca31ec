"""Benchmark harness.

Default (driver) mode prints ONE JSON line for the headline metric:
batched iLQR solves/s per chip on the 2-link model (BASELINE.md: >= 10,000
converged solves/s on a v5e-16 → 625 solves/s/chip; ``vs_baseline`` is
measured / 625).

Extra configs (BASELINE.json) via ``--config``:

  batched       4096 scenarios, T=100, solve to convergence   [default]
  strict        same, at the reference's own criterion (tol=1e-6 on
                sum((du)^2), src/forward_pass.jl:152,171; no gradient
                tolerances)
  rbd           floating-base RBD arm (n=16, m=8) batched solves —
                the reference's second benchmark problem
                (animate_RBD_2_link.jl:8-20)
  long_horizon  T=1000 batched solve (scan vs associative backend)
  mpc           single-scenario receding-horizon p50 latency (50 replans)
  mpc_batch     scenario-batched MPC replan latency (config 5 slice)
  single        one solve latency, T=100

Diagnostics go to stderr; the JSON line is the last stdout line.
"""

import argparse
import datetime
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))


def _emit(payload):
    """Print the driver-facing JSON line AND append it (with timestamp and
    invocation) to ``BENCH.jsonl`` so every run is published mechanically —
    no bench result can exist only in an orphaned log (VERDICT r4 next #3).
    """

    print(json.dumps(payload))
    record = dict(payload)
    record["ts"] = datetime.datetime.now(datetime.timezone.utc).isoformat(
        timespec="seconds")
    record["argv"] = sys.argv[1:]
    record["device"] = str(jax.devices()[0].platform)
    try:
        with open(os.path.join(_REPO_ROOT, "BENCH.jsonl"), "a") as f:
            f.write(json.dumps(record) + "\n")
    except OSError as e:  # pragma: no cover - read-only checkouts
        print(f"[bench] BENCH.jsonl append failed: {e}", file=sys.stderr)


def _time(f, *args, repeats=3):
    r = jax.block_until_ready(f(*args))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        r = jax.block_until_ready(f(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts), r


def _make_problem(name):
    if name == "rbd":
        from ilqr_tpu.models.rbd.model import make_rbd_arm_problem

        problem = make_rbd_arm_problem()
        # The reference example's initial state (RBD_helper_functions.jl:9):
        # quat [0,0,0,1] -> MRP [0,0,1], base at [.5,.75,1.], joints/vel 0.
        nominal = jnp.asarray(
            [0.0, 0.0, 1.0, 0.5, 0.75, 1.0, 0.0, 0.0] + [0.0] * 8,
            jnp.float32)
        return problem, nominal, 16, 8
    from ilqr_tpu.models.two_link import make_two_link_problem

    problem = make_two_link_problem()
    nominal = jnp.asarray([0.3, 0.7, 0.2, 0.5], jnp.float32)
    return problem, nominal, 4, 2


def bench_batched(batch=4096, T=100, max_iter=30, tol=1e-5,
                  backend="pallas", engine="fused", dtype=jnp.float32,
                  tol_grad=1e-10, tol_grad_rel=1e-6, adaptive_reg=False,
                  problem_name="two_link", noise=0.1, repeats=3, label="",
                  scan_unroll=8, derivative_chunk=0, iter_chunk=0,
                  reg=1e-2, reg_min=1e-6, reg_scale=10.0,
                  reg_backtrack_trigger=0, exact_ls_delta=False,
                  snapshot_every=0, ls_expected_decrease=False, ls_c=0.1,
                  snapshot_path=None, parallel_alpha_block=0,
                  compact_sizes=(), ls_alpha_warm_start=False):
    from ilqr_tpu.config import ILQRConfig, Status
    from ilqr_tpu.parallel.batching import make_batch_solver

    problem, nominal, n, m = _make_problem(problem_name)
    config = ILQRConfig(max_iter=max_iter, tol=tol, tol_grad=tol_grad,
                        tol_grad_rel=tol_grad_rel, adaptive_reg=adaptive_reg,
                        backward_backend=backend, scan_unroll=scan_unroll,
                        derivative_chunk=derivative_chunk, reg=reg,
                        reg_min=reg_min, reg_scale=reg_scale,
                        reg_backtrack_trigger=reg_backtrack_trigger,
                        exact_ls_delta=exact_ls_delta,
                        ls_expected_decrease=ls_expected_decrease, ls_c=ls_c,
                        parallel_alpha_block=parallel_alpha_block,
                        ls_alpha_warm_start=ls_alpha_warm_start)
    if iter_chunk > 0:
        # Host-chunked dispatches: bounded per-dispatch device time (the
        # single-dispatch RBD run at max_iter=60 died with a TPU device
        # fault through the tunnel, BENCH.md round 3) + per-chunk progress.
        from ilqr_tpu.batched import make_chunked_batch_solver
        from ilqr_tpu.problem import rollout

        t_origin = time.perf_counter()
        chunked = make_chunked_batch_solver(
            problem, config, iter_chunk=iter_chunk,
            snapshot_every=snapshot_every, snapshot_path=snapshot_path,
            compact_sizes=compact_sizes,
            on_chunk=lambda p, r: print(
                f"[bench:batched{label}]   chunk: passes={p} running={r} "
                f"t={time.perf_counter() - t_origin:.1f}s",
                file=sys.stderr) and False)
        roll = jax.jit(jax.vmap(lambda x0, us: rollout(problem.dynamics,
                                                       x0, us)))

        def solve_fn(x0s, us0):
            return chunked(roll(x0s, us0), us0)
    else:
        solve_fn = make_batch_solver(problem, config, engine=engine)

    key = jax.random.PRNGKey(0)
    if problem_name == "rbd":
        # Scenario distribution: perturb the POSE (attitude MRP by 0.4*noise,
        # base position + joints by noise), leave velocities at rest.
        # Perturbing velocities/attitude by the full noise makes a fraction
        # of scenarios drastically harder (measured round 3: 3/8 crawl past
        # 150 iterations on CPU at noise=0.05-everywhere vs 8/8 converged in
        # <=147 pose-only) — an MPC fleet replans from rest-ish states, not
        # from random joint-rate kicks.
        scale = jnp.asarray([0.4 * noise] * 3 + [noise] * (n // 2 - 3)
                            + [0.0] * (n // 2), dtype)
    else:
        scale = noise
    x0s = nominal + scale * jax.random.normal(key, (batch, n), dtype)
    us0 = jnp.zeros((batch, T, m), dtype)

    t0 = time.perf_counter()
    result = jax.block_until_ready(solve_fn(x0s, us0))
    compile_s = time.perf_counter() - t0
    # The compile call above already warmed every program; time the next
    # `repeats` runs directly (a solve can take minutes at RBD scale —
    # don't burn an extra run on a redundant warmup).
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        result = jax.block_until_ready(solve_fn(x0s, us0))
        ts.append(time.perf_counter() - t0)
    best = min(ts)

    n_conv = int(jnp.sum(result.status == int(Status.CONVERGED)))
    mean_iters = float(jnp.mean(result.iterations.astype(jnp.float32)))
    print(
        f"[bench:batched{label} problem={problem_name} backend={backend} "
        f"engine={engine}] device={jax.devices()[0]} "
        f"batch={batch} T={T} compile={compile_s:.1f}s best={best*1e3:.1f}ms "
        f"converged={n_conv}/{batch} mean_iters={mean_iters:.1f}",
        file=sys.stderr,
    )
    return batch / best, n_conv


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


def bench_long_horizon(T=1000, batch=256, backends=("scan", "pallas"),
                       engine="fused", scan_unroll=2):
    vals = {}
    for backend in backends:
        try:
            v, _ = bench_batched(batch=batch, T=T, max_iter=15,
                                 backend=backend, engine=engine,
                                 repeats=2, label=f" T={T}",
                                 scan_unroll=scan_unroll)
            vals[backend] = v
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


def bench_mpc_batch(batch=1024, horizon=50, n_steps=50, dtype=jnp.float32,
                    problem_name="two_link"):
    """Config 5 single-chip slice: a fleet of MPC scenarios replanning in
    lock-step; reports wall-clock per replan step for the whole batch.
    ``problem_name="rbd"`` runs the floating-base arm fleet (VERDICT r4
    next #8) with the solver setup that converges on the stiff RBD
    problem (Tassa reg escalation, scan_unroll=1)."""

    from ilqr_tpu.config import ILQRConfig
    from ilqr_tpu.parallel.mpc import batch_mpc_run

    problem, nominal, n, m = _make_problem(problem_name)
    if problem_name == "rbd":
        config = ILQRConfig(max_iter=10, tol=1e-5, tol_grad=1e-10,
                            tol_grad_rel=1e-6, adaptive_reg=True, reg=1.0,
                            reg_min=1e-3, reg_scale=10.0,
                            reg_backtrack_trigger=1, scan_unroll=1)
        scale = jnp.asarray([0.02] * 3 + [0.05] * (n // 2 - 3)
                            + [0.0] * (n // 2), dtype)
    else:
        config = ILQRConfig(max_iter=10, tol=1e-5, tol_grad=1e-10,
                            tol_grad_rel=1e-6)
        nominal = jnp.asarray([0.1, -0.1, 0.0, 0.0], dtype)
        scale = 0.1
    key = jax.random.PRNGKey(0)
    x0s = nominal + scale * jax.random.normal(key, (batch, n), dtype)
    f = jax.jit(lambda x: batch_mpc_run(problem, x, horizon, n_steps, config))
    t0 = time.perf_counter()
    r = jax.block_until_ready(f(x0s))
    compile_s = time.perf_counter() - t0
    best, r = _time(f, x0s, repeats=2)
    per_replan = best / n_steps
    mean_iters = float(jnp.mean(r.iterations.astype(jnp.float32)))
    print(f"[bench:mpc_batch problem={problem_name}] batch={batch} "
          f"horizon={horizon} "
          f"n_steps={n_steps} compile={compile_s:.1f}s "
          f"total={best*1e3:.1f}ms per_replan={per_replan*1e3:.2f}ms "
          f"scenario_replans_per_s={batch*n_steps/best:.0f} "
          f"mean_iters={mean_iters:.1f}", file=sys.stderr)
    return per_replan


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="batched",
                    choices=["batched", "strict", "rbd", "long_horizon",
                             "mpc", "mpc_batch", "single"])
    ap.add_argument("--backend", default="pallas",
                    choices=["scan", "associative", "pallas"])
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--T", type=int, default=None)
    ap.add_argument("--max-iter", type=int, default=None)
    ap.add_argument("--engine", default="fused", choices=["vmap", "fused"])
    ap.add_argument("--tol-grad", type=float, default=1e-10)
    ap.add_argument("--tol-grad-rel", type=float, default=1e-6)
    ap.add_argument("--adaptive-reg", action="store_true")
    ap.add_argument("--unroll", type=int, default=None,
                    help="rollout scan unroll (default 8; use 1-2 for "
                         "long-horizon/RBD to keep compiles tractable)")
    ap.add_argument("--deriv-chunk", type=int, default=0,
                    help="derivative-sweep lax.map chunk (0 = whole "
                         "horizon); bounds jacfwd peak memory for RBD")
    ap.add_argument("--iter-chunk", type=int, default=0,
                    help="host-chunked dispatches of at most this many "
                         "solver iterations (0 = single dispatch; rbd "
                         "defaults to 10); bounds per-dispatch device time")
    ap.add_argument("--parallel-alpha", type=int, default=0,
                    help="evaluate this many line-search rungs as extra "
                         "batch lanes per rollout "
                         "(config.parallel_alpha_block; 0 = sequential)")
    ap.add_argument("--snapshot-every", type=int, default=None,
                    help="host-snapshot every N chunks in the rbd config "
                         "(default 4; each snapshot is a ~25 MB "
                         "device->host transfer through the tunnel)")
    ap.add_argument("--ls-warm", action="store_true",
                    help="warm-started per-lane line-search ladder "
                         "(config.ls_alpha_warm_start)")
    ap.add_argument("--problem", default="two_link",
                    choices=["two_link", "rbd"],
                    help="model for the mpc_batch config")
    ap.add_argument("--compact", default="",
                    help="comma-separated straggler-compaction lane counts "
                         "for the chunked rbd config, e.g. '128,32' "
                         "(see make_chunked_batch_solver compact_sizes)")
    ap.add_argument("--snapshot-path", default=None,
                    help="persist chunk snapshots to this file and resume "
                         "from it if present (cross-process crash "
                         "recovery for the rbd config)")
    ap.add_argument("--ls-c", type=float, default=0.1,
                    help="expected-decrease acceptance ratio threshold")
    ap.add_argument("--ls-expected", action="store_true",
                    help="expected-decrease (Tassa ratio) line-search "
                         "acceptance (config.ls_expected_decrease)")
    ap.add_argument("--exact-delta", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="high-resolution line-search acceptance "
                         "(config.exact_ls_delta): sum of per-step cost "
                         "differences instead of rounded totals "
                         "(default: on for --config strict, off otherwise)")
    args = ap.parse_args()

    baseline_per_chip = 10000.0 / 16.0  # BASELINE.md: 10k solves/s on v5e-16

    if args.config == "batched":
        value, _ = bench_batched(batch=args.batch or 4096, T=args.T or 100,
                                 max_iter=args.max_iter or 30,
                                 backend=args.backend,
                                 engine=args.engine, tol_grad=args.tol_grad,
                                 tol_grad_rel=args.tol_grad_rel,
                                 adaptive_reg=args.adaptive_reg,
                                 scan_unroll=args.unroll or 8)
        _emit(dict({
            "metric": "ilqr_solves_per_s_per_chip_2link_N100",
            "value": round(value, 2),
            "unit": "solves/s",
            "vs_baseline": round(value / baseline_per_chip, 3),
        }))
    elif args.config == "strict":
        # The reference's own convergence rule: sum((du)^2) <= 1e-6
        # (src/forward_pass.jl:152,171), no gradient-based tests.
        value, n_conv = bench_batched(
            batch=args.batch or 4096, T=args.T or 100,
            max_iter=args.max_iter or 100, tol=1e-6,
            backend=args.backend, engine=args.engine,
            tol_grad=0.0, tol_grad_rel=0.0, label=" STRICT",
            scan_unroll=args.unroll or 8,
            exact_ls_delta=(True if args.exact_delta is None
                            else args.exact_delta))
        _emit(dict({
            "metric": "ilqr_solves_per_s_per_chip_2link_N100_strict_tol1e-6",
            "value": round(value, 2),
            "unit": "solves/s",
            "vs_baseline": round(value / baseline_per_chip, 3),
            "converged": n_conv,
        }))
    elif args.config == "rbd":
        # The reference's second benchmark problem at ITS OWN scale
        # (animate_RBD_2_link.jl:8-20: N=1000, reference initial state,
        # pose target [0,0,0,5,1,2,1,.3]).  Solver setup that actually
        # converges (diagnosed round 3): Tassa reg escalation, derivative
        # sweep chunked to bound jacfwd temps (T=1000 batch>=256 OOMs
        # un-chunked), host-chunked dispatches to bound per-dispatch device
        # time (single-dispatch max_iter=60 hit a TPU device fault).
        T = args.T or 1000
        value, n_conv = bench_batched(
            batch=args.batch or 256, T=T,
            max_iter=args.max_iter or 100,
            backend=args.backend, engine=args.engine,
            tol_grad=args.tol_grad, tol_grad_rel=args.tol_grad_rel,
            problem_name="rbd", noise=0.05, repeats=1,
            scan_unroll=args.unroll or 1,
            derivative_chunk=args.deriv_chunk or (100 if T >= 500 else 0),
            iter_chunk=args.iter_chunk or 10,
            # Host snapshots: a worker crash mid-solve (observed at
            # B=512/T=1000) resumes instead of losing the run.  Every
            # snapshot is a ~25 MB device->host transfer through this
            # tunnel (~0.25 s/pass at every-chunk cadence — measured
            # round 5), so the default snapshots every 4th chunk.
            snapshot_every=(4 if args.snapshot_every is None
                            else args.snapshot_every),
            adaptive_reg=True, reg=1.0, reg_min=1e-3,
            reg_scale=10.0, reg_backtrack_trigger=1,
            exact_ls_delta=bool(args.exact_delta),
            ls_expected_decrease=args.ls_expected, ls_c=args.ls_c,
            snapshot_path=args.snapshot_path,
            parallel_alpha_block=args.parallel_alpha,
            compact_sizes=tuple(int(s) for s in args.compact.split(",")
                                if s.strip()),
            ls_alpha_warm_start=args.ls_warm)
        _emit(dict({
            "metric": f"ilqr_solves_per_s_per_chip_rbd_n16_N{T}",
            "value": round(value, 2),
            "unit": "solves/s",
            "vs_baseline": None,
            "converged": n_conv,
        }))
    elif args.config == "single":
        value = bench_single(backend=args.backend)
        _emit(dict({
            "metric": "ilqr_single_solve_latency_2link_N100",
            "value": round(value * 1e3, 3),
            "unit": "ms",
            "vs_baseline": None,
        }))
    elif args.config == "long_horizon":
        value = bench_long_horizon(T=args.T or 1000, batch=args.batch or 256,
                                   backends=(args.backend,)
                                   if args.backend != "pallas"
                                   else ("scan", "pallas", "associative"),
                                   engine=args.engine,
                                   scan_unroll=args.unroll or 2)
        _emit(dict({
            "metric": "ilqr_solves_per_s_2link_N1000",
            "value": round(value, 2),
            "unit": "solves/s",
            "vs_baseline": None,
        }))
    elif args.config == "mpc":
        value = bench_mpc()
        _emit(dict({
            "metric": "mpc_replan_latency_p50_2link_H50",
            "value": round(value * 1e3, 3),
            "unit": "ms",
            "vs_baseline": None,
        }))
    elif args.config == "mpc_batch":
        batch = args.batch or (64 if args.problem == "rbd" else 1024)
        value = bench_mpc_batch(batch=batch, problem_name=args.problem)
        _emit(dict({
            "metric": (f"mpc_batch{batch}_replan_latency_"
                       f"{'rbd' if args.problem == 'rbd' else '2link'}_H50"),
            "value": round(value * 1e3, 3),
            "unit": "ms",
            "vs_baseline": None,
        }))


if __name__ == "__main__":
    main()

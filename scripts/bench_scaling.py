"""Scaling-efficiency benchmark: solves/s vs device count on one mesh.

Measures data-parallel scaling of the batched solver over a
``scenarios`` mesh (BASELINE.md target: >= 80% 1→N-host efficiency on a
v5e-16).  Runs unchanged on:

* this environment's virtual CPU mesh (``--platform cpu --devices 8``) —
  harness validation + correctness, the fake-backend strategy the
  reference lacks;
* a real single-host TPU slice (``--platform tpu``);
* a multi-host pod: launch one process per host with
  ``--coordinator host0:port --num-processes N --process-id $i`` (or let
  TPU auto-detection fill them in); ``jax.distributed`` is initialized via
  ``ilqr_tpu.parallel.distributed.initialize_multihost`` and the mesh spans
  every chip in the slice.

Output: one JSON line per device count with solves/s and efficiency vs the
single-device run (weak scaling: batch per device held fixed).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    ap.add_argument("--devices", type=int, default=8,
                    help="max devices to scale over (virtual when cpu)")
    ap.add_argument("--batch-per-device", type=int, default=64)
    ap.add_argument("--T", type=int, default=50)
    ap.add_argument("--max-iter", type=int, default=15)
    ap.add_argument("--coordinator", default=None,
                    help="coordinator address for multi-host runs")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    args = ap.parse_args()

    if args.platform == "cpu":
        os.environ.setdefault(
            "XLA_FLAGS",
            f"--xla_force_host_platform_device_count={args.devices}")
        os.environ["JAX_PLATFORMS"] = "cpu"

    from ilqr_tpu.parallel.distributed import initialize_multihost

    initialize_multihost(coordinator_address=args.coordinator,
                         num_processes=args.num_processes,
                         process_id=args.process_id)

    import jax
    import jax.numpy as jnp

    if args.platform == "cpu":
        # Some environments register an accelerator platform as the default
        # regardless of JAX_PLATFORMS; pin array creation to the CPU too.
        jax.config.update("jax_default_device", jax.devices("cpu")[0])

    from ilqr_tpu.config import ILQRConfig, Status
    from ilqr_tpu.models.two_link import make_two_link_problem
    from ilqr_tpu.parallel.mesh import (
        make_scenario_mesh,
        shard_scenarios,
        sharded_batch_solve,
    )

    devices = (jax.devices("cpu") if args.platform == "cpu"
               else jax.devices())
    n_max = min(args.devices, len(devices))
    problem = make_two_link_problem()
    config = ILQRConfig(max_iter=args.max_iter, tol=1e-5, tol_grad=1e-10,
                        tol_grad_rel=1e-6)

    counts = [c for c in (1, 2, 4, 8, 16, 32) if c <= n_max]
    base_rate = None
    for n_dev in counts:
        mesh = make_scenario_mesh(n_devices=n_dev, devices=devices)
        B = args.batch_per_device * n_dev  # weak scaling
        key = jax.random.PRNGKey(0)
        nominal = jnp.asarray([0.3, 0.7, 0.2, 0.5], jnp.float32)
        x0s = nominal + 0.1 * jax.random.normal(key, (B, 4), jnp.float32)
        us0 = jnp.zeros((B, args.T, 2), jnp.float32)
        x0s, us0 = shard_scenarios(mesh, x0s, us0)

        def run(a, b):
            return sharded_batch_solve(problem, mesh, a, b, config=config)

        result, metrics = run(x0s, us0)  # compile
        jax.block_until_ready(result.us)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            result, metrics = run(x0s, us0)
            jax.block_until_ready(result.us)
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        rate = B / best
        if base_rate is None:
            base_rate = rate / n_dev  # per-device baseline
        eff = rate / (base_rate * n_dev)
        n_conv = int(metrics["n_converged"])
        print(json.dumps({
            "devices": n_dev,
            "batch": B,
            "solves_per_s": round(rate, 1),
            "efficiency_vs_1dev": round(eff, 4),
            "converged": n_conv,
            "platform": str(devices[0].platform),
        }))
        # Sanity: at these settings (well-conditioned perturbations around
        # the nominal state) the solve must make progress on most lanes; a
        # zero converged count means the sharded path is broken.
        assert n_conv > 0, f"no lanes converged at n_dev={n_dev}"


if __name__ == "__main__":
    main()

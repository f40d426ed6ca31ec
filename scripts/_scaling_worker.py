"""Worker for the multi-PROCESS scaling bench (bench_scaling_mp.py).

One process per "host", one CPU device each, a real jax.distributed
cluster over a localhost coordinator: the sharded solve's psum-reduced
metrics cross processes over Gloo — this exercises the DCN/multi-host
code path, not the single-process virtual mesh.

argv: pid nproc port batch_per_proc T max_iter repeats
"""

import faulthandler
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

faulthandler.dump_traceback_later(480, exit=False)

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]
batch_per_proc = int(sys.argv[4])
T = int(sys.argv[5])
max_iter = int(sys.argv[6])
repeats = int(sys.argv[7])

import jax  # noqa: E402

from ilqr_tpu.parallel.distributed import initialize_multihost  # noqa: E402

initialize_multihost(coordinator_address=f"127.0.0.1:{port}",
                     num_processes=nproc, process_id=pid)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

cpus = jax.devices("cpu")
assert len(cpus) == nproc, f"expected {nproc} global cpu devices, got {cpus}"
local_cpu = next(d for d in cpus if d.process_index == pid)
jax.config.update("jax_default_device", local_cpu)
mesh = Mesh(np.asarray(cpus), ("scenarios",))

from ilqr_tpu.config import ILQRConfig  # noqa: E402
from ilqr_tpu.models.two_link import make_two_link_problem  # noqa: E402
from ilqr_tpu.parallel.mesh import sharded_batch_solve  # noqa: E402

problem = make_two_link_problem()
config = ILQRConfig(max_iter=max_iter, tol=1e-5, tol_grad=1e-10,
                    tol_grad_rel=1e-6)
B = batch_per_proc * nproc
key = jax.random.PRNGKey(0)
nominal = jnp.asarray([0.3, 0.7, 0.2, 0.5], jnp.float32)
x0s_h = np.asarray(nominal + 0.1 * jax.random.normal(key, (B, 4),
                                                     jnp.float32))
us0_h = np.zeros((B, T, 2), np.float32)
sharding = NamedSharding(mesh, P("scenarios"))
x0s = jax.make_array_from_process_local_data(sharding, x0s_h)
us0 = jax.make_array_from_process_local_data(sharding, us0_h)

solve = jax.jit(lambda a, b: sharded_batch_solve(problem, mesh, a, b,
                                                 config=config))
compiled = solve.lower(x0s, us0).compile()

from jax._src import distributed  # noqa: E402

client = distributed.global_state.client


def barrier(name):
    # nproc == 1 runs without jax.distributed (initialize_multihost is a
    # documented no-op there); barriers are meaningless then.
    if client is not None:
        client.wait_at_barrier(name, 600_000)


barrier("scaling_ready")

# Warm run (first execution initializes Gloo contexts).
result, metrics = compiled(x0s, us0)
jax.block_until_ready(result.us)

ts = []
for r in range(repeats):
    barrier(f"scaling_rep{r}")
    t0 = time.perf_counter()
    result, metrics = compiled(x0s, us0)
    jax.block_until_ready(result.us)
    ts.append(time.perf_counter() - t0)

if pid == 0:
    import json

    print(json.dumps({
        "processes": nproc,
        "batch": B,
        "best_s": min(ts),
        "solves_per_s": round(B / min(ts), 1),
        "converged": int(metrics["n_converged"]),
    }), flush=True)

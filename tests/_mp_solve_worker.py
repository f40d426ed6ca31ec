"""Worker for the real 2-process multi-host test (test_distributed.py).

Each process initializes jax.distributed against a localhost coordinator,
builds the global CPU mesh, assembles its shard of a deterministic global
scenario batch, and runs ``sharded_batch_solve`` — cross-process Gloo
collectives carry the psum-reduced metrics, so every process must print
identical converged counts and mean cost.

IMPORTANT (this environment): only the CPU backend may be touched.  Any
bare ``jax.devices()`` / ``jax.local_devices()`` call initializes the
tunneled TPU client, which blocks behind other TPU users.
"""

import faulthandler
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# If anything wedges (coordination rendezvous, collective init), dump
# where — the parent test surfaces this stderr on timeout.
faulthandler.dump_traceback_later(300, exit=False)

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]

import jax  # noqa: E402

from ilqr_tpu.parallel.distributed import initialize_multihost  # noqa: E402

initialize_multihost(coordinator_address=f"127.0.0.1:{port}",
                     num_processes=nproc, process_id=pid)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

cpus = jax.devices("cpu")
assert len(cpus) == nproc, f"expected {nproc} global cpu devices, got {cpus}"
assert sum(d.process_index == pid for d in cpus) == 1
local_cpu = next(d for d in cpus if d.process_index == pid)
# Pin ALL computation to the CPU backend: without this, scenario-batch
# construction below runs on the default (tunneled TPU) backend and can
# block indefinitely behind other tunnel clients.
jax.config.update("jax_default_device", local_cpu)
mesh = Mesh(np.asarray(cpus), ("scenarios",))

from ilqr_tpu.config import ILQRConfig  # noqa: E402
from ilqr_tpu.models.two_link import make_two_link_problem  # noqa: E402
from ilqr_tpu.parallel.mesh import sharded_batch_solve  # noqa: E402

problem = make_two_link_problem()
config = ILQRConfig(max_iter=12, tol=1e-5, tol_grad=1e-10, tol_grad_rel=1e-6)
B, T = 8, 16
key = jax.random.PRNGKey(0)  # same seed everywhere -> same global batch
nominal = jnp.asarray([0.3, 0.7, 0.2, 0.5], jnp.float32)
x0s_h = np.asarray(nominal + 0.1 * jax.random.normal(key, (B, 4), jnp.float32))
us0_h = np.zeros((B, T, 2), np.float32)
sharding = NamedSharding(mesh, P("scenarios"))
x0s = jax.make_array_from_process_local_data(sharding, x0s_h)
us0 = jax.make_array_from_process_local_data(sharding, us0_h)

# AOT-compile first, THEN rendezvous, THEN execute: Gloo's context init
# gives peers only ~30 s to arrive at the first collective, and on a
# contended 2-core host the workers' import+compile phases can skew past
# that.  After the coordination-service barrier both processes hit the
# collective within milliseconds.  (jax._src.distributed is the only
# handle to the already-initialized coordination client; test-only use.)
solve = jax.jit(lambda a, b: sharded_batch_solve(problem, mesh, a, b,
                                                 config=config))
compiled = solve.lower(x0s, us0).compile()

from jax._src import distributed  # noqa: E402

distributed.global_state.client.wait_at_barrier("mp_solve_ready", 600_000)

result, metrics = compiled(x0s, us0)
jax.block_until_ready(result.us)
print(f"proc {pid}: n_converged={int(metrics['n_converged'])} "
      f"mean_cost={float(metrics['mean_cost']):.6f}", flush=True)

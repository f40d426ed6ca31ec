"""Multi-host runtime helpers.

The reference is single-process (SURVEY.md §2.4).  This module wraps JAX's
multi-controller runtime: one process per host, ``jax.distributed``
coordination, a global mesh whose ``scenarios`` axis spans every chip in
the slice, per-host sharded PRNG for scenario sampling, and host-local
metric aggregation (global reductions happen on-device via psum inside
``sharded_batch_solve``).

On a single host everything degrades gracefully to the local mesh.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ilqr_tpu.parallel.mesh import SCENARIO_AXIS, make_scenario_mesh


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None,
                         initialization_timeout: Optional[int] = None) -> None:
    """Initialize the multi-controller runtime (no-op if single-process).

    On TPU pods the three arguments are auto-detected from the environment;
    pass them explicitly for CPU/GPU clusters.

    Failure policy: when the caller asked for a multi-process run (explicit
    ``coordinator_address`` or ``num_processes > 1``) an initialization
    failure RAISES — silently degrading to one process would "succeed" the
    job with 1/N of the work.  Only the fully-auto path (no arguments, no
    cluster detected) is allowed to fall back, and it warns when it does.
    """

    if num_processes is not None and num_processes <= 1:
        return
    if coordinator_address is None and jax.process_count() > 1:
        return  # already initialized by the launcher

    kwargs = {}
    if initialization_timeout is not None:
        kwargs["initialization_timeout"] = initialization_timeout
    if coordinator_address is not None:
        # Explicit cluster spec: never swallow a failure (e.g. a bad or
        # unreachable coordinator address raises out of here).
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id, **kwargs)
        return

    multi_requested = num_processes is not None and num_processes > 1
    try:
        jax.distributed.initialize(**kwargs)
    except Exception as e:
        if multi_requested:
            raise RuntimeError(
                f"multi-host initialization failed for num_processes="
                f"{num_processes}; refusing to silently run single-process"
            ) from e
        import warnings

        warnings.warn(
            "jax.distributed.initialize() failed; continuing single-process "
            f"(auto-detection found no cluster): {e!r}", stacklevel=2)


def global_scenario_mesh():
    """A 1-D global mesh over every device in the slice (all hosts)."""

    return make_scenario_mesh(devices=jax.devices())


def host_local_batch(global_batch: int) -> int:
    """Scenarios this host is responsible for (global batch must divide
    evenly across processes)."""

    n = jax.process_count()
    assert global_batch % n == 0, (global_batch, n)
    return global_batch // n


def per_host_keys(seed: int) -> jax.Array:
    """A PRNG key unique to this host, for host-local scenario sampling."""

    return jax.random.fold_in(jax.random.PRNGKey(seed), jax.process_index())


def make_global_scenario_array(local_values: jax.Array, mesh) -> jax.Array:
    """Assemble a globally-sharded array from per-host local shards
    (jax.make_array_from_process_local_data), sharded on the scenario axis."""

    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(SCENARIO_AXIS))
    return jax.make_array_from_process_local_data(sharding, np.asarray(local_values))

"""Scenario sharding over a (virtual) device mesh.

Runs on 8 virtual CPU devices (conftest) — the fake-backend strategy that
stands in for a real multi-chip TPU slice.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ilqr_tpu.config import ILQRConfig
from ilqr_tpu.models.two_link import make_two_link_problem
from ilqr_tpu.parallel.batching import batch_solve
from ilqr_tpu.parallel.mesh import (
    make_scenario_mesh,
    shard_scenarios,
    sharded_batch_solve,
)

from tests.conftest import cpu_devices


@pytest.fixture(scope="module")
def mesh():
    devs = cpu_devices()
    if len(devs) < 2:
        pytest.skip("needs multiple (virtual) devices")
    return make_scenario_mesh(devices=devs)


def test_sharded_solve_matches_unsharded(mesh):
    problem = make_two_link_problem()
    T = 12
    B = 16  # 2 per device
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(0.1 * rng.standard_normal((B, 4)))
    us0 = jnp.zeros((B, T, 2))
    config = ILQRConfig(max_iter=100, tol=1e-6)

    x0s_sh, us0_sh = shard_scenarios(mesh, x0s, us0)
    result, metrics = sharded_batch_solve(problem, mesh, x0s_sh, us0_sh,
                                          config=config)
    reference = batch_solve(problem, x0s, us0, config=config)

    np.testing.assert_allclose(np.asarray(result.us), np.asarray(reference.us),
                               atol=1e-9)
    np.testing.assert_array_equal(np.asarray(result.status),
                                  np.asarray(reference.status))
    # psum-reduced metrics agree with host-side aggregation.
    from ilqr_tpu.parallel.batching import batch_metrics

    ref_metrics = batch_metrics(reference)
    assert int(metrics["n_converged"]) == int(ref_metrics["n_converged"])


def test_output_sharding_layout(mesh):
    """Results stay sharded over the scenario axis (no full gather)."""

    problem = make_two_link_problem()
    B, T = 8, 8
    x0s = jnp.zeros((B, 4)).at[:, 0].set(jnp.linspace(0.0, 0.5, B))
    us0 = jnp.zeros((B, T, 2))
    x0s_sh, us0_sh = shard_scenarios(mesh, x0s, us0)
    result, _ = sharded_batch_solve(problem, mesh, x0s_sh, us0_sh,
                                    config=ILQRConfig(max_iter=5))
    sharding = result.us.sharding
    # One shard per device along the batch axis.
    assert len(sharding.device_set) == mesh.devices.size

"""Fused batch-last engine vs the vmapped reference engine: identical
results, all statuses, all iteration counts."""

import jax
import jax.numpy as jnp
import numpy as np

from ilqr_tpu.config import ILQRConfig, Status
from ilqr_tpu.models.two_link import make_two_link_problem
from ilqr_tpu.parallel.batching import batch_solve


def _setup(B=6, T=25, seed=0):
    problem = make_two_link_problem()
    rng = np.random.default_rng(seed)
    x0s = jnp.asarray(0.25 * rng.standard_normal((B, 4)))
    us0 = jnp.zeros((B, T, 2))
    return problem, x0s, us0


def test_fused_matches_vmap_scan_backend():
    problem, x0s, us0 = _setup()
    config = ILQRConfig(max_iter=60, tol=1e-8)
    ref = batch_solve(problem, x0s, us0, config=config, engine="vmap")
    out = batch_solve(problem, x0s, us0, config=config, engine="fused")

    np.testing.assert_array_equal(np.asarray(out.status), np.asarray(ref.status))
    np.testing.assert_array_equal(np.asarray(out.iterations),
                                  np.asarray(ref.iterations))
    np.testing.assert_allclose(np.asarray(out.us), np.asarray(ref.us),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(out.cost), np.asarray(ref.cost),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(out.alpha), np.asarray(ref.alpha))


def test_fused_with_pallas_backend(monkeypatch):
    monkeypatch.setenv("ILQR_TPU_PALLAS_INTERPRET", "1")
    problem, x0s, us0 = _setup(B=4, T=12, seed=1)
    config = ILQRConfig(max_iter=30, tol=1e-8, backward_backend="pallas")
    ref = batch_solve(problem, x0s, us0,
                      config=ILQRConfig(max_iter=30, tol=1e-8), engine="vmap")
    out = batch_solve(problem, x0s, us0, config=config, engine="fused")
    np.testing.assert_array_equal(np.asarray(out.status), np.asarray(ref.status))
    np.testing.assert_allclose(np.asarray(out.us), np.asarray(ref.us),
                               rtol=1e-8, atol=1e-10)


def test_fused_failure_isolation():
    """NaN-poisoned lane fails; the rest of the batch is unaffected."""

    problem, x0s, us0 = _setup(B=3, T=15, seed=2)
    x0s = x0s.at[1, 0].set(jnp.nan)
    config = ILQRConfig(max_iter=40, tol=1e-8)
    out = batch_solve(problem, x0s, us0, config=config, engine="fused")
    ref = batch_solve(problem, x0s, us0, config=config, engine="vmap")
    np.testing.assert_array_equal(np.asarray(out.status), np.asarray(ref.status))
    assert int(out.status[1]) != int(Status.CONVERGED)
    assert int(out.status[0]) == int(Status.CONVERGED)
    np.testing.assert_allclose(np.asarray(out.us)[[0, 2]],
                               np.asarray(ref.us)[[0, 2]], atol=1e-10)


def test_chunked_derivative_sweep_is_identical():
    """derivatives_bl with lax.map time-chunking returns bit-identical local
    models (it is a pure memory-bounding knob), and the fused solve with
    config.derivative_chunk set matches the unchunked solve."""

    import jax.numpy as jnp

    from ilqr_tpu.batched import batched_solve_fused, derivatives_bl, rollout_bl

    problem, x0s, us0 = _setup(B=4, T=24, seed=5)
    x0_bl = jnp.moveaxis(x0s, 0, -1)
    us_bl = jnp.moveaxis(us0, 0, -1) + 0.05
    xs_bl = rollout_bl(problem, x0_bl, us_bl)

    full = derivatives_bl(problem, xs_bl, us_bl, chunk=0)
    chunked = derivatives_bl(problem, xs_bl, us_bl, chunk=8)
    for a, b in zip(full, chunked):
        # lax.map vs vmap fuse slightly differently — agreement to rounding.
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-12, atol=1e-14)

    config = ILQRConfig(max_iter=40, tol=1e-8)
    xs0 = jnp.moveaxis(rollout_bl(problem, x0_bl, jnp.moveaxis(us0, 0, -1)),
                       -1, 0)
    ref = batched_solve_fused(problem, xs0, us0, config=config)
    out = batched_solve_fused(problem, xs0, us0,
                              config=config.replace(derivative_chunk=6))
    np.testing.assert_array_equal(np.asarray(out.status), np.asarray(ref.status))
    np.testing.assert_allclose(np.asarray(out.us), np.asarray(ref.us),
                               rtol=1e-9, atol=1e-11)


def test_fused_adaptive_reg():
    problem, x0s, us0 = _setup(B=3, T=20, seed=3)
    config = ILQRConfig(max_iter=60, tol=1e-8, adaptive_reg=True)
    ref = batch_solve(problem, x0s, us0, config=config, engine="vmap")
    out = batch_solve(problem, x0s, us0, config=config, engine="fused")
    np.testing.assert_array_equal(np.asarray(out.status), np.asarray(ref.status))
    np.testing.assert_allclose(np.asarray(out.us), np.asarray(ref.us),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(out.reg), np.asarray(ref.reg))


def test_chunked_driver_matches_single_dispatch():
    """make_chunked_batch_solver (host-chunked dispatches) returns exactly
    the single-while_loop fused result, for chunk sizes that do and do not
    divide the iteration count."""

    from ilqr_tpu.batched import batched_solve_fused, make_chunked_batch_solver
    from ilqr_tpu.problem import rollout

    problem, x0s, us0 = _setup(B=5, T=20, seed=7)
    config = ILQRConfig(max_iter=60, tol=1e-8)
    xs0 = jax.vmap(lambda x0, us: rollout(problem.dynamics, x0, us))(x0s, us0)
    ref = batched_solve_fused(problem, xs0, us0, config=config)

    for iter_chunk in (3, 7, 100):
        chunks = []
        solve_fn = make_chunked_batch_solver(
            problem, config, iter_chunk=iter_chunk,
            on_chunk=lambda n_passes, n_running: chunks.append(
                (n_passes, n_running)) and False)
        out = solve_fn(xs0, us0)
        np.testing.assert_array_equal(np.asarray(out.status),
                                      np.asarray(ref.status))
        np.testing.assert_array_equal(np.asarray(out.iterations),
                                      np.asarray(ref.iterations))
        np.testing.assert_allclose(np.asarray(out.us), np.asarray(ref.us),
                                   rtol=1e-12, atol=1e-14)
        np.testing.assert_allclose(np.asarray(out.cost), np.asarray(ref.cost),
                                   rtol=1e-12)
        assert len(chunks) >= 1
        assert chunks[-1][1] == 0  # all lanes finished
        # progress is monotone in passes and cumulative across dispatches
        passes = [c[0] for c in chunks]
        assert passes == sorted(passes)


def test_chunked_driver_crash_resume():
    """snapshot_every + max_retries: a runtime fault mid-solve resumes from
    the last host snapshot and still produces exactly the single-dispatch
    result (the real trigger: the B=512/T=1000 RBD bench killed the TPU
    worker mid-run, BENCH.md round 3)."""

    from ilqr_tpu.batched import batched_solve_fused, make_chunked_batch_solver
    from ilqr_tpu.problem import rollout

    problem, x0s, us0 = _setup(B=5, T=20, seed=7)
    config = ILQRConfig(max_iter=60, tol=1e-8)
    xs0 = jax.vmap(lambda x0, us: rollout(problem.dynamics, x0, us))(x0s, us0)
    ref = batched_solve_fused(problem, xs0, us0, config=config)

    faults = {"count": 0}

    def fault_twice(chunk_idx):
        # Fail the 2nd dispatch twice (a post-chunk-1 snapshot exists).
        if chunk_idx == 1 and faults["count"] < 2:
            faults["count"] += 1
            raise jax.errors.JaxRuntimeError("injected: device fault")

    solve_fn = make_chunked_batch_solver(
        problem, config, iter_chunk=2, snapshot_every=1, max_retries=2,
        _fault_hook=fault_twice)
    out = solve_fn(xs0, us0)
    assert faults["count"] == 2  # both injected faults fired and were retried
    np.testing.assert_array_equal(np.asarray(out.status),
                                  np.asarray(ref.status))
    np.testing.assert_array_equal(np.asarray(out.iterations),
                                  np.asarray(ref.iterations))
    np.testing.assert_allclose(np.asarray(out.us), np.asarray(ref.us),
                               rtol=1e-12, atol=1e-14)

    # Without snapshots the same fault is fatal (no silent mask).
    faults["count"] = 0
    solve_fn2 = make_chunked_batch_solver(
        problem, config, iter_chunk=2, _fault_hook=fault_twice)
    import pytest

    with pytest.raises(jax.errors.JaxRuntimeError):
        solve_fn2(xs0, us0)


def test_chunked_driver_early_abort():
    from ilqr_tpu.batched import make_chunked_batch_solver
    from ilqr_tpu.problem import rollout

    problem, x0s, us0 = _setup(B=3, T=15, seed=8)
    config = ILQRConfig(max_iter=50, tol=1e-12)  # tight tol: runs long
    xs0 = jax.vmap(lambda x0, us: rollout(problem.dynamics, x0, us))(x0s, us0)
    solve_fn = make_chunked_batch_solver(
        problem, config, iter_chunk=2,
        on_chunk=lambda n_passes, n_running: n_passes >= 4)  # abort early
    out = solve_fn(xs0, us0)
    assert int(np.max(np.asarray(out.iterations))) <= 4


def test_fused_tassa_reg_schedule():
    """adaptive_reg with reg_backtrack_trigger (raise reg on backtracked
    accepts, Tassa-style): fused engine matches the vmapped engine."""

    problem, x0s, us0 = _setup(B=4, T=20, seed=9)
    config = ILQRConfig(max_iter=60, tol=1e-8, adaptive_reg=True,
                        reg=1.0, reg_min=1e-4, reg_scale=5.0,
                        reg_backtrack_trigger=1)
    ref = batch_solve(problem, x0s, us0, config=config, engine="vmap")
    out = batch_solve(problem, x0s, us0, config=config, engine="fused")
    np.testing.assert_array_equal(np.asarray(out.status), np.asarray(ref.status))
    np.testing.assert_allclose(np.asarray(out.us), np.asarray(ref.us),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(out.reg), np.asarray(ref.reg))


def test_chunked_solver_cross_process_resume(tmp_path):
    """snapshot_path persists progress to disk; a FRESH solver (new
    process in production — simulated here by a new solve_fn whose
    injected fault killed the first run) resumes from the file and
    produces the uninterrupted result.  The file is removed on success."""

    import os

    from ilqr_tpu.batched import make_chunked_batch_solver
    from ilqr_tpu.models.two_link import make_two_link_problem
    from ilqr_tpu.problem import rollout

    problem = make_two_link_problem()
    config = ILQRConfig(max_iter=12, tol=1e-14)  # runs all 12 iters
    B, T = 4, 20
    key = jax.random.PRNGKey(0)
    x0s = (jnp.asarray([0.3, 0.7, 0.2, 0.5], jnp.float32)
           + 0.1 * jax.random.normal(key, (B, 4), jnp.float32))
    us0 = jnp.zeros((B, T, 2), jnp.float32)
    roll = jax.vmap(lambda a, b: rollout(problem.dynamics, a, b))
    xs0 = roll(x0s, us0)

    ref = make_chunked_batch_solver(problem, config, iter_chunk=3)(xs0, us0)

    snap = os.path.join(tmp_path, "solve.npz")

    class Dead(Exception):
        pass

    def die_at_chunk_2(idx):
        if idx == 1:
            # Simulate a process-killing fault (worker restart): raise
            # something the in-process retry does NOT handle.
            raise Dead()

    first = make_chunked_batch_solver(problem, config, iter_chunk=3,
                                      snapshot_path=snap,
                                      _fault_hook=die_at_chunk_2)
    try:
        first(xs0, us0)
        assert False, "fault hook should have killed the first run"
    except Dead:
        pass
    assert os.path.exists(snap)  # progress persisted before the crash

    resumed = make_chunked_batch_solver(problem, config, iter_chunk=3,
                                        snapshot_path=snap)(xs0, us0)
    assert not os.path.exists(snap)  # cleaned up on success
    np.testing.assert_array_equal(np.asarray(resumed.status),
                                  np.asarray(ref.status))
    np.testing.assert_allclose(np.asarray(resumed.us), np.asarray(ref.us),
                               rtol=0, atol=0)
    np.testing.assert_array_equal(np.asarray(resumed.iterations),
                                  np.asarray(ref.iterations))

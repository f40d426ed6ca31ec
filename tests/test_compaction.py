"""Straggler compaction (`make_chunked_batch_solver(compact_sizes=...)`):
the compacted solve must return the same per-lane results as the
uncompacted chunked solve, with finished lanes' results preserved across
the shrink + write-back."""

import jax
import jax.numpy as jnp
import numpy as np

from ilqr_tpu.batched import make_chunked_batch_solver
from ilqr_tpu.config import ILQRConfig, Status
from ilqr_tpu.models.two_link import make_two_link_problem
from ilqr_tpu.problem import rollout


def _setup(B=24, T=40):
    problem = make_two_link_problem()
    key = jax.random.PRNGKey(0)
    nominal = jnp.asarray([0.3, 0.7, 0.2, 0.5], jnp.float32)
    # Per-lane difficulty ramp: early lanes converge in a few iterations,
    # late lanes take many — the straggler population compaction targets.
    scale = jnp.linspace(0.05, 1.6, B, dtype=jnp.float32)[:, None]
    x0s = nominal + scale * jax.random.normal(key, (B, 4), jnp.float32)
    us0 = jnp.zeros((B, T, 2), jnp.float32)
    roll = jax.vmap(lambda x0, us: rollout(problem.dynamics, x0, us))
    return problem, roll(x0s, us0), us0


def test_compaction_matches_uncompacted():
    problem, xs0, us0 = _setup()
    config = ILQRConfig(max_iter=40, tol=1e-5, tol_grad=1e-10,
                        tol_grad_rel=1e-6, backward_backend="scan")

    compact_steps = []
    plain = make_chunked_batch_solver(problem, config, iter_chunk=3)
    compact = make_chunked_batch_solver(
        problem, config, iter_chunk=2, compact_sizes=(16, 8),
        on_chunk=lambda p, r: compact_steps.append((p, r)) and False)

    r0 = plain(xs0, us0)
    r1 = compact(xs0, us0)

    # Compaction must actually have triggered (some lanes converge well
    # before others at this spread).
    assert any(r <= 16 for _, r in compact_steps[:-1]), compact_steps

    np.testing.assert_array_equal(np.asarray(r0.status),
                                  np.asarray(r1.status))
    np.testing.assert_array_equal(np.asarray(r0.iterations),
                                  np.asarray(r1.iterations))
    np.testing.assert_allclose(np.asarray(r0.us), np.asarray(r1.us),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(r0.cost), np.asarray(r1.cost),
                               rtol=1e-6, atol=1e-7)


def test_compaction_with_snapshot_resume(tmp_path):
    """Compaction + cross-process snapshot_path: snapshots hold the merged
    full batch, so a resume starts full-size and re-compacts."""

    problem, xs0, us0 = _setup(B=16)
    config = ILQRConfig(max_iter=30, tol=1e-5, tol_grad=1e-10,
                        tol_grad_rel=1e-6, backward_backend="scan")
    snap = str(tmp_path / "snap.npz")

    # First process: die mid-solve (an exception, not a clean break —
    # a clean exit removes the snapshot file).
    class Died(Exception):
        pass

    def die_at(p, r):
        if p >= 3:
            raise Died
        return False

    stopper = make_chunked_batch_solver(
        problem, config, iter_chunk=3, compact_sizes=(8,),
        snapshot_path=snap, on_chunk=die_at)
    import pytest
    with pytest.raises(Died):
        stopper(xs0, us0)
    import os
    assert os.path.exists(snap)

    resumed = make_chunked_batch_solver(
        problem, config, iter_chunk=3, compact_sizes=(8,),
        snapshot_path=snap)
    r1 = resumed(xs0, us0)
    assert not os.path.exists(snap)

    plain = make_chunked_batch_solver(problem, config, iter_chunk=3)
    r0 = plain(xs0, us0)
    np.testing.assert_array_equal(np.asarray(r0.status),
                                  np.asarray(r1.status))
    np.testing.assert_allclose(np.asarray(r0.us), np.asarray(r1.us),
                               rtol=1e-6, atol=1e-7)
    assert int(jnp.sum(r1.status == int(Status.CONVERGED))) > 0


def test_alpha_warm_start_converges_and_saves_rungs():
    """ls_alpha_warm_start (default-off extension): same converged lanes,
    fewer total ladder rungs on a problem with crawling lanes."""

    from ilqr_tpu.utils.metrics import solve_with_trace

    problem, xs0, us0 = _setup(B=8, T=30)
    base = dict(max_iter=30, tol=1e-5, tol_grad=1e-10, tol_grad_rel=1e-6,
                backward_backend="scan")
    c_plain = ILQRConfig(**base)
    c_warm = ILQRConfig(**base, ls_alpha_warm_start=True)

    r0, t0 = jax.vmap(
        lambda xs, us: solve_with_trace(problem, xs, us, config=c_plain)
    )(xs0, us0)
    r1, t1 = jax.vmap(
        lambda xs, us: solve_with_trace(problem, xs, us, config=c_warm)
    )(xs0, us0)

    s0 = np.asarray(r0.status)
    s1 = np.asarray(r1.status)
    conv = int(Status.CONVERGED)
    # Warm start must not lose convergence on this easy set.
    assert (s1 == conv).sum() >= (s0 == conv).sum()
    # Rung count = backtracks + 1 per valid iteration; warm start should
    # not do MORE total rollouts.
    rungs0 = float(jnp.sum(jnp.where(t0.valid, t0.backtracks + 1, 0)))
    rungs1 = float(jnp.sum(jnp.where(t1.valid, t1.backtracks + 1, 0)))
    assert rungs1 <= rungs0, (rungs0, rungs1)

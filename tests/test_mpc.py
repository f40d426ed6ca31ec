"""Receding-horizon MPC driver tests."""

import jax.numpy as jnp
import numpy as np

from ilqr_tpu.config import ILQRConfig
from ilqr_tpu.models.two_link import inverse_kinematics, make_two_link_problem, TwoLinkParams
from ilqr_tpu.parallel.mpc import batch_mpc_run, make_mpc_runner, mpc_run


def test_mpc_tracks_target():
    """50-step replanning with a 60-step horizon moves the arm toward the
    IK target (the shape of BASELINE.json config 5, in miniature)."""

    params = TwoLinkParams()
    problem = make_two_link_problem(params)
    x0 = jnp.asarray([0.1, -0.1, 0.0, 0.0])
    config = ILQRConfig(max_iter=30, tol=1e-8, tol_grad=1e-12)
    result = mpc_run(problem, x0, horizon=60, n_steps=50, config=config)

    assert result.xs.shape == (51, 4)
    assert result.us.shape == (50, 2)
    assert np.isfinite(np.asarray(result.xs)).all()

    target = inverse_kinematics(params, jnp.asarray([params.target_x,
                                                     params.target_y]))
    err0 = float(jnp.sum((x0[:2] - target) ** 2))
    err1 = float(jnp.sum((result.xs[-1, :2] - target) ** 2))
    assert err1 < err0  # closed-loop progress toward the target


def test_mpc_warm_start_reduces_iterations():
    """After the first replan, warm starts should converge in fewer
    iterations than the cold first solve."""

    problem = make_two_link_problem()
    x0 = jnp.asarray([0.2, 0.3, 0.0, 0.0])
    config = ILQRConfig(max_iter=50, tol=1e-8, tol_grad=1e-12)
    result = mpc_run(problem, x0, horizon=40, n_steps=12, config=config)
    iters = np.asarray(result.iterations)
    assert iters[1:].mean() <= iters[0]


def test_batch_mpc():
    problem = make_two_link_problem()
    x0s = jnp.asarray([[0.1, -0.1, 0.0, 0.0], [0.3, 0.2, 0.0, 0.0]])
    config = ILQRConfig(max_iter=15, tol=1e-8)
    result = batch_mpc_run(problem, x0s, horizon=20, n_steps=5, config=config)
    assert result.us.shape == (2, 5, 2)
    single = mpc_run(problem, x0s[0], horizon=20, n_steps=5, config=config)
    np.testing.assert_allclose(np.asarray(result.us[0]), np.asarray(single.us),
                               atol=1e-10)


def test_chunked_mpc_matches_and_resumes(tmp_path):
    """batch_mpc_run_chunked equals batch_mpc_run, and a killed run
    resumes from its checkpoint producing the identical result."""

    import os

    from ilqr_tpu.parallel.mpc import batch_mpc_run_chunked

    problem = make_two_link_problem()
    x0s = jnp.asarray([[0.1, -0.1, 0.0, 0.0], [0.3, 0.2, 0.0, 0.0]])
    config = ILQRConfig(max_iter=15, tol=1e-8)
    ref = batch_mpc_run(problem, x0s, horizon=20, n_steps=6, config=config)

    # Uninterrupted chunked run == plain batched run.
    r = batch_mpc_run_chunked(problem, x0s, horizon=20, n_steps=6,
                              config=config, step_chunk=2)
    np.testing.assert_allclose(np.asarray(r.us), np.asarray(ref.us),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(r.xs), np.asarray(ref.xs),
                               atol=1e-10)

    # "Kill" the run after 1 chunk (on_chunk aborts), then resume from the
    # checkpoint: the completed run must equal the uninterrupted one.
    ck = os.path.join(tmp_path, "mpc.npz")
    partial = batch_mpc_run_chunked(problem, x0s, horizon=20, n_steps=6,
                                    config=config, step_chunk=2,
                                    checkpoint_path=ck,
                                    on_chunk=lambda step: step >= 2)
    assert os.path.exists(ck)
    # Steps beyond the abort are zero-filled in the partial result.
    assert float(np.abs(np.asarray(partial.us)[:, 4:]).sum()) == 0.0

    resumed = batch_mpc_run_chunked(problem, x0s, horizon=20, n_steps=6,
                                    config=config, step_chunk=2,
                                    checkpoint_path=ck)
    np.testing.assert_allclose(np.asarray(resumed.us), np.asarray(ref.us),
                               atol=1e-10)
    np.testing.assert_array_equal(np.asarray(resumed.statuses),
                                  np.asarray(ref.statuses))

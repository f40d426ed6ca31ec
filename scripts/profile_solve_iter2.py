"""Narrow the 26ms-vs-6ms per-iteration gap (profile_solve_iter round 2).

Times the ACTUAL shared step body (`step.ilqr_step` with the batch-last
engine) under different loop structures and with phases knocked out, at
the headline config.  Distinguishes:

* step body cost when chained in a fori_loop (the roofline measurement
  style) vs inside the production while_loop with its data-dependent
  cond;
* the cost of the forward half vs the backward half of the body;
* the cost of the convergence/status bookkeeping + trajectory selects.

Run (TPU): JAX_COMPILATION_CACHE_DIR=.jax_cache python scripts/profile_solve_iter2.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def measure(f, *args, repeats=3):
    out = jax.block_until_ready(f(*args))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = jax.block_until_ready(f(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def main():
    from ilqr_tpu.batched import make_batch_last_engine, rollout_bl
    from ilqr_tpu.config import ILQRConfig, Status
    from ilqr_tpu.models.two_link import make_two_link_problem
    from ilqr_tpu.step import ilqr_step, ilqr_step_apply, \
        ilqr_step_backward, initial_state

    B, T = 4096, 100
    dtype = jnp.float32
    problem = make_two_link_problem()
    config = ILQRConfig(max_iter=8, tol=0.0, tol_grad=0.0, tol_grad_rel=0.0,
                        max_backtracks=1)
    engine = make_batch_last_engine(problem, None, config)

    key = jax.random.PRNGKey(0)
    nominal = jnp.asarray([0.3, 0.7, 0.2, 0.5], dtype)
    x0s = nominal + 0.1 * jax.random.normal(key, (B, 4), dtype)
    x0_bl = jnp.moveaxis(x0s, 0, -1)
    us_bl = jnp.zeros((T, 2, B), dtype)
    xs_bl = rollout_bl(problem, x0_bl, us_bl)
    state0 = initial_state(xs_bl, us_bl, config, lane_shape=(B,))

    print(f"device: {jax.devices()[0]}  B={B} T={T}", flush=True)
    REPS = 8

    def report(tag, t, compile_s):
        print(f"{tag:46s} {t/REPS*1e3:8.2f} ms/step (compile {compile_s:.0f}s)",
              flush=True)

    def timed(tag, fn, *args):
        f = jax.jit(fn)
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        c = time.perf_counter() - t0
        best, _ = measure(f, *args)
        report(tag, best, c)
        return best

    # 1. Full step body, fori_loop (fixed trip count, no cond).
    def fori_steps(state):
        def body(_, s):
            return ilqr_step(engine, config, s)[0]
        return jax.lax.fori_loop(0, REPS, body, state)

    timed("full step, fori_loop", fori_steps, state0)

    # 2. Full step body, while_loop with the production cond.
    def while_steps(state):
        def cond(carry):
            s, k = carry
            return jnp.logical_and(
                jnp.any(s.status == int(Status.RUNNING)), k < REPS)

        def body(carry):
            s, k = carry
            return ilqr_step(engine, config, s)[0], k + 1
        return jax.lax.while_loop(cond, body, (state0, jnp.int32(0)))[0]

    timed("full step, while_loop + cond", while_steps, state0)

    # 3. Backward half only (derivatives + Riccati), fori chained.
    def bwd_only(state):
        def body(_, s):
            duffs, Ks, dV1 = ilqr_step_backward(engine, s)
            xs = s.xs.at[0, 0].add(1e-12 * dV1)  # data dependence
            return s._replace(xs=xs)
        return jax.lax.fori_loop(0, REPS, body, state)

    timed("backward half only, fori_loop", bwd_only, state0)

    # 4. Forward half only (precomputed gains), fori chained.
    duffs0, Ks0, dV10 = jax.jit(
        lambda s: ilqr_step_backward(engine, s))(state0)

    def fwd_only(state):
        def body(_, s):
            s2, _aux = ilqr_step_apply(engine, config, s, duffs0, Ks0, dV10)
            return s2._replace(status=state0.status,
                               prev_cost=state0.prev_cost)
        return jax.lax.fori_loop(0, REPS, body, state)

    timed("forward half only, fori_loop", fwd_only, state0)


if __name__ == "__main__":
    main()

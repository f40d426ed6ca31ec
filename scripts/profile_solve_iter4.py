"""Bisect the batched_solve_fused per-iteration anomaly.

profile_solve_iter2 (round 3) measured the shared step body chaining at
8.2 ms/step in a fori_loop at B=4096/T=100, while profile_solve_iter
measured batched_solve_fused's marginal cost at 26 ms/iteration — the
same `ilqr_step` body, 3x apart.  This script reproduces both numbers and
bisects the wrapper differences one at a time:

  A. batched_solve_fused verbatim (fixed 8 iters)     [expect ~29 ms/it]
  B. A minus entry moveaxis + finalize (batch-last in/out)
  C. B with fori_loop instead of while_loop
  D. iter2 harness verbatim (fori over ilqr_step)     [expect ~8 ms/it]
  E. D but with the (state, n_passes) while_loop cond of the solver

Run (TPU): JAX_COMPILATION_CACHE_DIR=.jax_cache python scripts/profile_solve_iter4.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def measure(f, *args, repeats=3):
    t0 = time.perf_counter()
    out = jax.block_until_ready(f(*args))
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = jax.block_until_ready(f(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts), compile_s


ITERS = 8


def main():
    from ilqr_tpu.batched import (
        batched_solve_fused,
        make_batch_last_engine,
        rollout_bl,
        total_cost_bl,
    )
    from ilqr_tpu.config import ILQRConfig, Status
    from ilqr_tpu.models.two_link import make_two_link_problem
    from ilqr_tpu.problem import rollout
    from ilqr_tpu.step import finalize_status, ilqr_step, initial_state

    B, T = 4096, 100
    dtype = jnp.float32
    problem = make_two_link_problem()
    config = ILQRConfig(max_iter=ITERS, tol=0.0, tol_grad=0.0,
                        tol_grad_rel=0.0, max_backtracks=1)
    engine = make_batch_last_engine(problem, None, config)

    key = jax.random.PRNGKey(0)
    nominal = jnp.asarray([0.3, 0.7, 0.2, 0.5], dtype)
    x0s = nominal + 0.1 * jax.random.normal(key, (B, 4), dtype)
    us0 = jnp.zeros((B, T, 2), dtype)
    roll = jax.jit(jax.vmap(lambda x0, us: rollout(problem.dynamics, x0, us)))
    xs0 = jax.block_until_ready(roll(x0s, us0))

    x0_bl = jnp.moveaxis(x0s, 0, -1)
    us_bl = jnp.moveaxis(us0, 0, -1)
    xs_bl = jax.block_until_ready(
        jax.jit(lambda a, b: rollout_bl(problem, a, b))(x0_bl, us_bl))
    state0 = initial_state(xs_bl, us_bl, config, lane_shape=(B,))

    print(f"device: {jax.devices()[0]}  B={B} T={T} iters={ITERS}",
          flush=True)

    def report(tag, best, compile_s):
        print(f"{tag:52s} {best/ITERS*1e3:8.2f} ms/it (compile {compile_s:.0f}s)",
              flush=True)

    # A. The production path verbatim.
    fA = jax.jit(lambda a, b: batched_solve_fused(problem, a, b,
                                                  config=config))
    report("A batched_solve_fused (batch-first io)", *measure(fA, xs0, us0))

    # B. Same loop, batch-last io, no finalize.
    def fB(xs_bl, us_bl):
        def cond(carry):
            state, n = carry
            return jnp.logical_and(
                jnp.any(state.status == int(Status.RUNNING)), n < ITERS)

        def body(carry):
            state, n = carry
            return ilqr_step(engine, config, state)[0], n + 1

        init = initial_state(xs_bl, us_bl, config, lane_shape=(B,))
        final, _ = jax.lax.while_loop(cond, body, (init, jnp.int32(0)))
        return final

    report("B while_loop, batch-last io, no finalize",
           *measure(jax.jit(fB), xs_bl, us_bl))

    # C. fori_loop instead.
    def fC(xs_bl, us_bl):
        init = initial_state(xs_bl, us_bl, config, lane_shape=(B,))
        return jax.lax.fori_loop(
            0, ITERS, lambda _, s: ilqr_step(engine, config, s)[0], init)

    report("C fori_loop, batch-last io", *measure(jax.jit(fC), xs_bl, us_bl))

    # D. iter2 harness: external state0.
    def fD(state):
        return jax.lax.fori_loop(
            0, ITERS, lambda _, s: ilqr_step(engine, config, s)[0], state)

    report("D fori_loop, external init state", *measure(jax.jit(fD), state0))

    # E. while_loop with production cond, external state0.
    def fE(state):
        def cond(carry):
            s, n = carry
            return jnp.logical_and(
                jnp.any(s.status == int(Status.RUNNING)), n < ITERS)

        def body(carry):
            s, n = carry
            return ilqr_step(engine, config, s)[0], n + 1

        final, _ = jax.lax.while_loop(cond, body, (state, jnp.int32(0)))
        return final

    report("E while_loop, external init state", *measure(jax.jit(fE), state0))

    # F. A again but with finalize only (no moveaxis at entry).
    def fF(xs_bl, us_bl):
        final = fB(xs_bl, us_bl)
        status = finalize_status(final.status)
        cost = jnp.where(jnp.isinf(final.prev_cost),
                         total_cost_bl(problem, final.xs, final.us, None),
                         final.prev_cost)
        return final.xs, final.us, cost, status

    report("F B + finalize (still batch-last io)",
           *measure(jax.jit(fF), xs_bl, us_bl))


if __name__ == "__main__":
    main()

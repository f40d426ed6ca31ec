"""Bisect the backward-half anomaly (27.9 ms in the step body vs 2.6 ms
in the roofline's isolated chained measurements).  Same chaining harness
for everything, same config objects as the solver."""

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


REPS = 8


def main():
    from ilqr_tpu.batched import derivatives_bl, riccati_bl, rollout_bl
    from ilqr_tpu.config import ILQRConfig
    from ilqr_tpu.models.two_link import make_two_link_problem

    B, T = 4096, 100
    dtype = jnp.float32
    problem = make_two_link_problem()
    cfg_scan = ILQRConfig(backward_backend="scan", scan_unroll=8)
    cfg_scan1 = ILQRConfig(backward_backend="scan", scan_unroll=1)
    cfg_pallas = ILQRConfig(backward_backend="pallas")

    key = jax.random.PRNGKey(0)
    x0_bl = jnp.asarray([0.3, 0.7, 0.2, 0.5], dtype)[:, None] \
        + 0.1 * jax.random.normal(key, (4, B), dtype)
    us_bl = 0.01 * jax.random.normal(key, (T, 2, B), dtype)
    xs_bl = rollout_bl(problem, x0_bl, us_bl)
    reg = jnp.full((B,), 0.01, dtype)

    print(f"device: {jax.devices()[0]}  B={B} T={T}", flush=True)

    def timed(tag, fn, *args):
        f = jax.jit(fn)
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        c = time.perf_counter() - t0
        best, _ = measure(f, *args)
        print(f"{tag:46s} {best/REPS*1e3:8.2f} ms/step (compile {c:.0f}s)",
              flush=True)

    # Derivatives alone, chained on xs.
    def deriv_chain(xs, us):
        def body(_, xs):
            out = derivatives_bl(problem, xs, us)
            return xs + 1e-12 * out[2][0, 0][None, None, :]
        return jax.lax.fori_loop(0, REPS, body, xs)

    timed("derivatives_bl", deriv_chain, xs_bl, us_bl)

    # Riccati alone, chained on qxN.
    models = jax.jit(lambda a, b: derivatives_bl(problem, a, b))(xs_bl, us_bl)

    def ric_chain(cfg):
        def run(models):
            def body(_, m):
                duffs, Ks, dv1, dv2 = riccati_bl(*m, reg=reg, config=cfg)
                bump = 1e-12 * dv1
                return m[:7] + (m[7] + bump[None, :], m[8])
            return jax.lax.fori_loop(0, REPS, body, models)
        return run

    timed("riccati_bl scan unroll=8", ric_chain(cfg_scan), models)
    timed("riccati_bl scan unroll=1", ric_chain(cfg_scan1), models)
    timed("riccati_bl pallas", ric_chain(cfg_pallas), models)

    # Derivatives + riccati together (the engine.backward composition).
    def both_chain(cfg):
        def run(xs, us):
            def body(_, xs):
                m = derivatives_bl(problem, xs, us)
                duffs, Ks, dv1, dv2 = riccati_bl(*m, reg=reg, config=cfg)
                return xs + 1e-12 * dv1[None, None, :]
            return jax.lax.fori_loop(0, REPS, body, xs)
        return run

    timed("deriv + riccati (scan8)", both_chain(cfg_scan), xs_bl, us_bl)
    timed("deriv + riccati (pallas)", both_chain(cfg_pallas), xs_bl, us_bl)

    # The single-output feedback above lets XLA dead-code-eliminate most
    # of the sweep.  Force FULL computation by reducing every output into
    # the feedback, selectively: which half of the sweep is the real cost?
    def deriv_forced(which):
        def run(xs, us):
            def body(_, xs):
                As, Bs, qx, ru, Qxx, Pux, Ruu, qxN, QN = derivatives_bl(
                    problem, xs, us)
                if which == "all":
                    s = (jnp.sum(As) + jnp.sum(Bs) + jnp.sum(qx)
                         + jnp.sum(ru) + jnp.sum(Qxx) + jnp.sum(Pux)
                         + jnp.sum(Ruu) + jnp.sum(qxN) + jnp.sum(QN))
                elif which == "AB":
                    s = jnp.sum(As) + jnp.sum(Bs)
                else:  # quads
                    s = (jnp.sum(qx) + jnp.sum(ru) + jnp.sum(Qxx)
                         + jnp.sum(Pux) + jnp.sum(Ruu))
                return xs + 1e-20 * s
            return jax.lax.fori_loop(0, REPS, body, xs)
        return run

    timed("deriv FULL outputs (forced)", deriv_forced("all"), xs_bl, us_bl)
    timed("deriv A,B only (quads DCEd)", deriv_forced("AB"), xs_bl, us_bl)
    timed("deriv quads only (A,B DCEd)", deriv_forced("quads"), xs_bl, us_bl)


if __name__ == "__main__":
    main()

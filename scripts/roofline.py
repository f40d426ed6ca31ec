"""Speed-of-light accounting for the hot phases (BENCH.md roofline section).

Counts HBM bytes and VPU FLOPs analytically for the backward Riccati
kernel and the closed-loop rollout at the headline config (B=4096, T=100,
n=4, m=2), measures the isolated phase times on the chip, and prints the
percentage of the hardware bound each phase reaches.

Two timings per phase, because this environment dispatches through a
remote-execution tunnel with a large FIXED per-call overhead (~20 ms —
measured directly below as `dispatch overhead`):

* single — one dispatch per call, what `measure()` naively sees.  The
  round-2 roofline published these and concluded "0.8% of
  speed-of-light"; that conclusion was an artifact of the tunnel, not a
  property of the kernels.
* chained — `REPS` dependent applications inside ONE jitted fori_loop
  (output feeds the next input), divided by REPS.  This amortizes
  dispatch and is the number to compare against the roofline.

Run: JAX_COMPILATION_CACHE_DIR=.jax_cache python scripts/roofline.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

HBM_GBPS = 819.0
VPU_TFLOPS = 1.93
REPS = 20


def measure_single(f, *args, repeats=5):
    out = jax.block_until_ready(f(*args))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = jax.block_until_ready(f(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def measure_chained(fn_one, feedback, *args, reps=REPS):
    """Per-call time of `reps` dependent applications inside one jit."""

    @jax.jit
    def chained(*a):
        def body(_, carry):
            out = fn_one(*carry)
            return feedback(out, carry)
        return jax.lax.fori_loop(0, reps, body, a)

    out = jax.block_until_ready(chained(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = jax.block_until_ready(chained(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts) / reps


def backward_model(n, m, T, B, dtype_bytes=4):
    """Analytic bytes/flops for one whole-horizon backward pass."""

    in_floats = 2 * n * n + 2 * n * m + m * m + n + m   # A,Qxx,B,Pux,Ruu,qx,ru
    out_floats = n * m + m + 2                          # K,duff,dv1,dv2
    bytes_total = (in_floats + out_floats) * dtype_bytes * T * B

    mults = (
        m * n * n      # B^T S
        + m * n        # g
        + m * n * n    # G = BT_S A
        + m * m * n    # H = BT_S B
        + m ** 3 // 3 + 3 * m   # cholesky
        + m * m * (n + 1) * 2   # tri solves for duff + K
        + m * m        # H duff
        + n * n + 2 * m * n + m * n   # s_vec terms
        + 2 * n ** 3   # S A, A^T (SA)
        + m * m * n + n * m * n + n * m * n  # HK, K^T HK, K^T G
        + 2 * n * n    # adds + symmetrize
    )
    flops_total = 2 * mults * T * B  # mult+add
    return bytes_total, flops_total


def rollout_model(n, m, T, B, dyn_flops, dtype_bytes=4):
    in_floats = n + m + m + m * n        # x_old, u_old, duff, K
    out_floats = n + m                   # x_new, u_new
    bytes_total = (in_floats + out_floats) * dtype_bytes * T * B
    flops_total = (2 * m * n + dyn_flops) * T * B
    return bytes_total, flops_total


def main():
    from ilqr_tpu.batched import (
        closed_loop_rollout_bl,
        derivatives_bl,
        riccati_bl,
        rollout_bl,
    )
    from ilqr_tpu.config import ILQRConfig
    from ilqr_tpu.models.two_link import make_two_link_problem

    B, T, n, m = 4096, 100, 4, 2
    dtype = jnp.float32
    problem = make_two_link_problem()
    config_pallas = ILQRConfig(backward_backend="pallas")
    config_scan = ILQRConfig(backward_backend="scan")

    key = jax.random.PRNGKey(0)
    x0 = jnp.asarray([0.3, 0.7, 0.2, 0.5], dtype)[:, None] \
        + 0.1 * jax.random.normal(key, (4, B), dtype)
    us = 0.1 * jax.random.normal(key, (T, m, B), dtype)

    print(f"device: {jax.devices()[0]}  B={B} T={T} n={n} m={m}  "
          f"chained reps={REPS}")

    # Fixed per-dispatch overhead of this environment (remote tunnel).
    tiny = jnp.zeros((8,), dtype)
    t_disp, _ = measure_single(jax.jit(lambda x: x + 1.0), tiny)
    print(f"dispatch overhead      {t_disp*1e3:8.3f} ms  "
          "(fixed cost of ONE device call through the tunnel)")

    # Open-loop rollout to get a trajectory.
    ro = jax.jit(lambda a, b: rollout_bl(problem, a, b))
    t_ro, xs = measure_single(ro, x0, us)
    t_ro_c = measure_chained(
        lambda a, b: (rollout_bl(problem, a, b), b),
        lambda out, carry: (out[0][-1] * 1e-9 + carry[0], carry[1]),
        x0, us)

    # Derivative sweep.
    der = jax.jit(lambda a, b: derivatives_bl(problem, a, b))
    t_der, models = measure_single(der, xs, us)
    t_der_c = measure_chained(
        lambda a, b: derivatives_bl(problem, a, b) + (a, b),
        lambda out, carry: (carry[0] + 1e-12 * out[2][0, 0][None, :],
                            carry[1]),
        xs, us)

    # Backward kernel (pallas + scan).
    reg = jnp.full((B,), 0.01, dtype)

    def bw_feedback(out, carry):
        # feed dv1 into a tiny bump of qxN to keep a data dependence
        duffs, Ks, dv1, dv2 = out
        bump = jnp.zeros_like(carry[7]).at[0].set(1e-12 * dv1)
        return carry[:7] + (carry[7] + bump, carry[8])

    bw_p = jax.jit(lambda mo: riccati_bl(*mo, reg=reg, config=config_pallas))
    t_bwp, out = measure_single(bw_p, models)
    t_bwp_c = measure_chained(
        lambda *mo: riccati_bl(*mo, reg=reg, config=config_pallas),
        bw_feedback, *models)
    bw_s = jax.jit(lambda mo: riccati_bl(*mo, reg=reg, config=config_scan))
    t_bws, _ = measure_single(bw_s, models)
    t_bws_c = measure_chained(
        lambda *mo: riccati_bl(*mo, reg=reg, config=config_scan),
        bw_feedback, *models)
    duffs, Ks = out[0], out[1]

    # Closed-loop rollout (one alpha).
    alpha = jnp.ones((B,), dtype)
    clr = jax.jit(lambda xs_, us_, d_, K_: closed_loop_rollout_bl(
        problem, xs_, us_, d_, K_, alpha))
    t_clr, _ = measure_single(clr, xs, us, duffs, Ks)
    t_clr_c = measure_chained(
        lambda xs_, us_, d_, K_: closed_loop_rollout_bl(
            problem, xs_, us_, d_, K_, alpha) + (d_, K_),
        lambda out, carry: (carry[0] + 1e-12 * out[0], carry[1], carry[2],
                            carry[3]),
        xs, us, duffs, Ks)

    bw_bytes, bw_flops = backward_model(n, m, T, B)
    # two-link RK4 dynamics: 4 stages x (trig + M/C build + 2x2 solve) ~ 120
    ro_bytes, ro_flops = rollout_model(n, m, T, B, dyn_flops=120)

    def report(name, t_single, t_chain, bytes_, flops):
        t_bw = bytes_ / (HBM_GBPS * 1e9)
        t_fl = flops / (VPU_TFLOPS * 1e12)
        sol = max(t_bw, t_fl)
        bound = "HBM" if t_bw > t_fl else "VPU"
        print(f"{name:22s} single {t_single*1e3:8.3f} ms | chained "
              f"{t_chain*1e3:8.3f} ms | SoL={sol*1e3:7.3f}ms ({bound}-bound)"
              f" -> {100*sol/t_chain:5.1f}% of speed-of-light "
              f"(single-call would claim {100*sol/t_single:5.1f}%)")

    print()
    report("backward (pallas)", t_bwp, t_bwp_c, bw_bytes, bw_flops)
    report("backward (scan)", t_bws, t_bws_c, bw_bytes, bw_flops)
    report("closed-loop rollout", t_clr, t_clr_c, ro_bytes, ro_flops)
    print(f"{'derivative sweep':22s} single {t_der*1e3:8.3f} ms | chained "
          f"{t_der_c*1e3:8.3f} ms  (AD of RK4 dynamics; analytic-override "
          "path; no SoL model)")
    print(f"{'open-loop rollout':22s} single {t_ro*1e3:8.3f} ms | chained "
          f"{t_ro_c*1e3:8.3f} ms")


if __name__ == "__main__":
    main()

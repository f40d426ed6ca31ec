"""Speed-of-light accounting for the hot phases (BENCH.md roofline section).

Counts HBM bytes and VPU FLOPs analytically for the backward Riccati
kernel and the closed-loop rollout at the headline config (B=4096, T=100,
n=4, m=2), measures the isolated phase times on the chip, and prints the
percentage of the hardware bound each phase reaches.

Hardware model (TPU v5e, 1 chip):
  HBM bandwidth     819 GB/s
  VPU f32           8 ALUs/lane-set * 128 lanes * 8 sublanes * 940 MHz
                    ~ 1.93 Tflop/s  (elementwise; no MXU in these phases —
                    n, m are far below the 128x128 MXU tile)

Run: JAX_COMPILATION_CACHE_DIR=.jax_cache python scripts/roofline.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

HBM_GBPS = 819.0
VPU_TFLOPS = 1.93


def fmt(x):
    return f"{x*1e3:8.3f} ms"


def measure(f, *args, repeats=5):
    out = jax.block_until_ready(f(*args))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = jax.block_until_ready(f(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts), out


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

    print(f"device: {jax.devices()[0]}  B={B} T={T} n={n} m={m}")

    # Open-loop rollout to get a trajectory.
    ro = jax.jit(lambda a, b: rollout_bl(problem, a, b))
    t_ro, xs = measure(ro, x0, us)

    # Derivative sweep.
    der = jax.jit(lambda a, b: derivatives_bl(problem, a, b))
    t_der, models = measure(der, xs, us)

    # Backward kernel (pallas + scan).
    bw_p = jax.jit(lambda mo: riccati_bl(*mo, reg=jnp.full((B,), 0.01, dtype),
                                         config=config_pallas))
    t_bwp, out = measure(bw_p, models)
    bw_s = jax.jit(lambda mo: riccati_bl(*mo, reg=jnp.full((B,), 0.01, dtype),
                                         config=config_scan))
    t_bws, _ = measure(bw_s, models)
    duffs, Ks = out[0], out[1]

    # Closed-loop rollout (one alpha).
    clr = jax.jit(lambda xs_, us_, d_, K_: closed_loop_rollout_bl(
        problem, xs_, us_, d_, K_, jnp.ones((B,), dtype)))
    t_clr, _ = measure(clr, xs, us, duffs, Ks)

    bw_bytes, bw_flops = backward_model(n, m, T, B)
    # two-link RK4 dynamics: 4 stages x (trig + M/C build + 2x2 solve) ~ 120
    ro_bytes, ro_flops = rollout_model(n, m, T, B, dyn_flops=120)

    def report(name, t, bytes_, flops):
        t_bw = bytes_ / (HBM_GBPS * 1e9)
        t_fl = flops / (VPU_TFLOPS * 1e12)
        sol = max(t_bw, t_fl)
        bound = "HBM" if t_bw > t_fl else "VPU"
        print(f"{name:22s} {fmt(t)}  bytes={bytes_/2**20:7.1f}MiB "
              f"flops={flops/1e9:6.2f}G  SoL={sol*1e3:7.3f}ms ({bound}-bound) "
              f"-> {100*sol/t:5.1f}% of speed-of-light")

    print()
    report("backward (pallas)", t_bwp, bw_bytes, bw_flops)
    report("backward (scan)", t_bws, bw_bytes, bw_flops)
    report("closed-loop rollout", t_clr, ro_bytes, ro_flops)
    print(f"{'derivative sweep':22s} {fmt(t_der)}  (AD of RK4 dynamics; "
          "analytic-override path)")
    print(f"{'open-loop rollout':22s} {fmt(t_ro)}")


if __name__ == "__main__":
    main()

"""True kernel-time measurement for the backward Riccati pass.

Per-call wall timing through the remote-execution tunnel carries a large
fixed dispatch overhead, so each phase is also measured as a CHAIN of
``reps`` dependent calls inside one jitted ``lax.fori_loop`` (output feeds
the next call's input), divided by ``reps`` — amortizing dispatch and
giving the number the roofline should be compared against.

Run: JAX_COMPILATION_CACHE_DIR=.jax_cache python scripts/microbench_backward.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def make_models(n, m, T, B, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda *s: jnp.asarray(0.05 * rng.standard_normal(s), dtype)
    eye_n = jnp.eye(n, dtype=dtype)[None, :, :, None]
    eye_m = jnp.eye(m, dtype=dtype)[None, :, :, None]
    return (
        0.95 * jnp.broadcast_to(eye_n, (T, n, n, B)) + mk(T, n, n, B),  # As
        mk(T, n, m, B),                                                 # Bs
        mk(T, n, B),                                                    # qx
        mk(T, m, B),                                                    # ru
        jnp.broadcast_to(eye_n, (T, n, n, B)).copy(),                   # Qxx
        0.1 * mk(T, m, n, B),                                           # Pux
        jnp.broadcast_to(0.1 * eye_m, (T, m, m, B)).copy(),             # Ruu
        mk(n, B),                                                       # qxN
        jnp.broadcast_to(jnp.eye(n, dtype=dtype)[:, :, None],
                         (n, n, B)).copy(),                             # QN
    )


def timed_chain(fn_one, feedback, reps, *args):
    """Time `reps` dependent applications of fn_one inside one jit."""

    @jax.jit
    def chained(*a):
        def body(_, carry):
            out = fn_one(*carry)
            return feedback(out, carry)
        return jax.lax.fori_loop(0, reps, body, a)

    out = jax.block_until_ready(chained(*args))  # compile
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = jax.block_until_ready(chained(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts) / reps


def main():
    from ilqr_tpu.batched import riccati_bl_scan
    from ilqr_tpu.ops.pallas_riccati import riccati_scan_pallas_bl

    T = 100
    print(f"device: {jax.devices()[0]}  T={T}")
    for (n, m) in [(4, 2), (16, 8)]:
        for B in (1024, 4096):
            models = make_models(n, m, T, B)
            reg = jnp.full((B,), 0.01, jnp.float32)

            def pallas_one(*mo):
                return riccati_scan_pallas_bl(*mo, reg=reg)

            def scan_one(*mo):
                return riccati_bl_scan(*mo, reg=reg, unroll=8)

            # Feed duffs back into qxN's slot (shape [m,B] vs [n,B]) — pad
            # to keep a data dependence without changing the model shapes.
            def feedback(out, carry):
                duffs, Ks, dv1, dv2 = out
                bump = jnp.zeros_like(carry[7]).at[0].set(1e-6 * dv1)
                return carry[:7] + (carry[7] + bump, carry[8])

            t_p = timed_chain(pallas_one, feedback, 10, *models)
            t_s = timed_chain(scan_one, feedback, 10, *models)

            # HBM speed-of-light for the streamed model + outputs.
            io_floats = (2 * n * n + 2 * n * m + m * m + n + m
                         + n * m + m + 2)
            sol = io_floats * 4 * T * B / 819e9
            print(f"n={n:2d} m={m} B={B}: pallas {t_p*1e3:7.3f} ms  "
                  f"scan {t_s*1e3:7.3f} ms  HBM-SoL {sol*1e3:6.3f} ms  "
                  f"pallas@{100*sol/t_p:5.1f}% of SoL")


if __name__ == "__main__":
    main()

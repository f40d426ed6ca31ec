"""On-TPU Pallas-vs-scan backward-pass equality check (part of /verify).

The test suite exercises the Pallas kernel in interpret mode on CPU;
this script runs the REAL Mosaic-compiled kernel on the chip against the
batch-last lax.scan backend on identical random local models and asserts
elementwise agreement, at both the two-link (n=4, m=2) and RBD (n=16, m=8)
shapes.

Run: JAX_COMPILATION_CACHE_DIR=.jax_cache python scripts/verify_pallas_tpu.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def check(n, m, T=60, B=512, tol=2e-5):
    from ilqr_tpu.batched import riccati_bl_scan
    from ilqr_tpu.ops.pallas_riccati import riccati_scan_pallas_bl

    rng = np.random.default_rng(n * 100 + m)
    mk = lambda *s: jnp.asarray(0.05 * rng.standard_normal(s), jnp.float32)
    As = 0.95 * jnp.broadcast_to(
        jnp.eye(n, dtype=jnp.float32)[None, :, :, None], (T, n, n, B)
    ) + mk(T, n, n, B)
    Bs = mk(T, n, m, B)
    qx, ru = mk(T, n, B), mk(T, m, B)
    Qxx = jnp.broadcast_to(jnp.eye(n, dtype=jnp.float32)[None, :, :, None],
                           (T, n, n, B)) + 0.0 * mk(T, n, n, B)
    Pux = mk(T, m, n, B) * 0.1
    Ruu = jnp.broadcast_to(0.1 * jnp.eye(m, dtype=jnp.float32)[None, :, :, None],
                           (T, m, m, B)) + 0.0 * mk(T, m, m, B)
    qxN = mk(n, B)
    QN = jnp.broadcast_to(jnp.eye(n, dtype=jnp.float32)[:, :, None], (n, n, B))

    reg = jnp.full((B,), 0.01, jnp.float32)
    pall = jax.jit(lambda: riccati_scan_pallas_bl(
        As, Bs, qx, ru, Qxx, Pux, Ruu, qxN, QN, reg=reg))
    scan = jax.jit(lambda: riccati_bl_scan(
        As, Bs, qx, ru, Qxx, Pux, Ruu, qxN, QN, reg=reg))

    dp, Kp, v1p, v2p = jax.block_until_ready(pall())
    ds, Ks, v1s, v2s = jax.block_until_ready(scan())

    for name, a, b in [("duffs", dp, ds), ("Ks", Kp, Ks),
                       ("dv1", v1p, v1s), ("dv2", v2p, v2s)]:
        err = float(jnp.max(jnp.abs(a - b)))
        scale = float(jnp.max(jnp.abs(b))) + 1e-30
        assert err / scale < tol, (n, m, name, err, scale)
        print(f"n={n:2d} m={m} {name:6s} max_rel_err={err/scale:.2e}  OK")


if __name__ == "__main__":
    dev = jax.devices()[0]
    print(f"device: {dev}")
    assert dev.platform != "cpu", "this check must run on the real TPU"
    check(4, 2)
    check(16, 8)
    print("PALLAS==SCAN on TPU: verified")

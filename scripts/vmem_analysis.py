"""VMEM budget analysis for the fused Pallas Riccati kernel (ROADMAP 4).

The kernel keeps the value carry (S [n,n], s [n]) plus one timestep of
local models in VMEM, every entry an (8, 128)-tiled batch vector.  Per-step
VMEM in f32 with batch tile Bs*128 lanes:

    inputs   (2n² + nm + mn + m² + n + m) tiles   (A, Qxx, B, Pux, Ruu, qx, ru)
    outputs  (nm + m + 2) tiles                    (K, duff, dv1, dv2)
    carry    (n² + n) tiles                        (S, s  scratch)
    consts   (n² + n) tiles                        (QN, qxN)

each tile Bs*128*4 bytes, inputs/outputs double-buffered by the pipeline,
plus live temporaries (BT_S, G, H, L, K, SA, AtSA, HK, KtHK, KtG ~ 4n² + 4nm
+ 2m² tiles at peak).  At n=4, m=2 (two-link) and Bs=8 this is well under
1 MB; at n=16, m=8 (RBD) it is ~18 MB > 16 MB VMEM, so the wrapper must
drop to a smaller batch tile.  This script measures where the cliff is.

Run on the TPU:  python scripts/vmem_analysis.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def theoretical_tiles(n, m):
    io = 2 * (2 * n * n + 2 * n * m + m * m + n + m)   # double-buffered in
    out = 2 * (n * m + m + 2)
    carry = n * n + n
    consts = n * n + n
    temps = 4 * n * n + 4 * n * m + 2 * m * m
    return io + out + carry + consts + temps


def try_config(n, m, T, B, dtype=jnp.float32):
    from ilqr_tpu.ops.pallas_riccati import riccati_scan_pallas_bl

    rng = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(0.01 * rng.standard_normal(s), dtype)
    As = mk(T, n, n, B)
    Bs = mk(T, n, m, B)
    qx = mk(T, n, B)
    ru = mk(T, m, B)
    eye = jnp.eye(n, dtype=dtype)[None, :, :, None]
    Qxx = jnp.broadcast_to(eye, (T, n, n, B)).copy()
    Pux = mk(T, m, n, B) * 0.0
    Ruu = jnp.broadcast_to(jnp.eye(m, dtype=dtype)[None, :, :, None],
                           (T, m, m, B)).copy()
    qxN = mk(n, B)
    QN = jnp.broadcast_to(jnp.eye(n, dtype=dtype)[:, :, None], (n, n, B)).copy()

    f = jax.jit(lambda *a: riccati_scan_pallas_bl(*a, reg=0.01))
    t0 = time.time()
    try:
        out = jax.block_until_ready(f(As, Bs, qx, ru, Qxx, Pux, Ruu, qxN, QN))
        compile_s = time.time() - t0
        ts = []
        for _ in range(3):
            t1 = time.perf_counter()
            out = jax.block_until_ready(f(As, Bs, qx, ru, Qxx, Pux, Ruu, qxN, QN))
            ts.append(time.perf_counter() - t1)
        est_tiles = theoretical_tiles(n, m)
        bs = 8  # wrapper pads to (8,128) tiles
        est_mb = est_tiles * bs * 128 * 4 / 2**20
        print(f"n={n:3d} m={m:2d} T={T} B={B}: OK  "
              f"compile={compile_s:.1f}s best={min(ts)*1e3:.2f}ms "
              f"est_vmem~{est_mb:.1f}MB")
        return True
    except Exception as e:
        print(f"n={n:3d} m={m:2d} T={T} B={B}: FAIL ({type(e).__name__}: "
              f"{str(e)[:200]})")
        return False


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}")
    for n, m in [(4, 2), (8, 4), (16, 8)]:
        try_config(n, m, T=100, B=1024)

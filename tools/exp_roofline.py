"""Calibrate the live TPU backend: HBM bandwidth, VPU flops, MXU flops.

All timed with the honest in-jit scan + float() readback (bench.py
methodology).  Establishes the roofline that BASELINE.md perf claims are
judged against.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, K, *args):
    @jax.jit
    def run(*args):
        def body(acc, i):
            return acc + fn(acc, *args), None
        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(K, dtype=jnp.uint32))
        return acc

    float(run(*args))
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(*args))
        best = min(best, time.perf_counter() - t0)
    return best / K


def main():
    K = 10
    print(f"backend={jax.default_backend()}", file=sys.stderr)

    # NOTE (round 4): every in-jit serialized iteration on this tunneled
    # backend carries a ~2.5 ms floor (matches the per-pallas_call cost in
    # kernels/cluster.py) — any single measurement below ~3 ms is
    # floor-dominated.  Each resource is therefore measured at TWO sizes
    # and the MARGINAL rate (delta work / delta time) is the ceiling that
    # BASELINE.md's roofline uses.

    # --- HBM bandwidth: sum of a big array (read-only) ---
    hbm = {}
    for mb in (256, 1024):
        n = mb * 1024 * 1024 // 4
        x = jnp.ones((n,), jnp.float32)

        def f_sum(acc, x):
            return jnp.sum(x * (acc + jnp.float32(1)))
        dt = bench(f_sum, K, x)
        hbm[mb] = dt
        print(f"hbm_read {mb}MB: {dt*1e3:7.2f} ms  {mb/1024/dt:7.1f} GB/s")
    marg = (1024 - 256) / 1024 / (hbm[1024] - hbm[256])
    print(f"hbm_read marginal (1024-256MB): {marg:7.1f} GB/s")

    # --- VPU flops: chained fma on a resident block, two depths ---
    n = 8 * 1024 * 1024  # 32 MB
    x = jnp.ones((n,), jnp.float32) * 0.5
    vpu = {}
    for DEPTH in (64, 512):
        def f_fma(acc, x, DEPTH=DEPTH):
            y = x + acc
            for _ in range(DEPTH):
                y = y * jnp.float32(1.0000001) + jnp.float32(1e-7)
            return jnp.sum(y)
        dt = bench(f_fma, K, x)
        vpu[DEPTH] = dt
        flops = n * DEPTH * 2
        print(f"vpu_fma d{DEPTH} on 32MB: {dt*1e3:7.2f} ms  "
              f"{flops/dt/1e12:6.2f} Tflop/s")
    marg = n * (512 - 64) * 2 / (vpu[512] - vpu[64])
    print(f"vpu_fma marginal (d512-d64): {marg/1e12:6.2f} Tflop/s")

    # --- MXU: f32 and bf16 big matmul ---
    for dt_, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        m = 4096
        a = jnp.ones((m, m), dt_)
        b = jnp.ones((m, m), dt_)

        def f_mm(acc, a, b):
            return jnp.sum((a * (acc.astype(dt_) + 1)) @ b).astype(jnp.float32)
        dtm = bench(f_mm, K, a, b)
        print(f"mxu_{name} {m}^3: {dtm*1e3:7.2f} ms  "
              f"{2*m**3/dtm/1e12:6.2f} Tflop/s")

    # --- (R, T) elementwise + argmin pattern at the sweep's shape ---
    R, T = 1024 * 1024, 43
    x = jnp.ones((R, T), jnp.float32)

    rt = {}
    for mult in (1, 4):
        xm = jnp.ones((R * mult, T), jnp.float32)

        def f_el(acc, x):
            y = x * (acc + jnp.float32(2)) + jnp.float32(1)
            return jnp.sum(jnp.min(y, axis=-1))
        dt = bench(f_el, K, xm)
        rt[mult] = dt
        print(f"rt_min ({R*mult}x{T}): {dt*1e3:7.2f} ms  "
              f"{R*mult*T*4/dt/1e9:7.1f} GB/s-effective")
    marg = R * 3 * T * 4 / (rt[4] - rt[1])
    print(f"rt_min marginal (4x-1x): {marg/1e9:7.1f} GB/s-effective")

    def f_am(acc, x):
        y = x * (acc + jnp.float32(2)) + jnp.float32(1)
        idx = jnp.argmin(y, axis=-1)
        t = jnp.take_along_axis(y, idx[:, None], axis=-1)[:, 0]
        return jnp.sum(t) + jnp.sum(idx.astype(jnp.float32))
    dt = bench(f_am, K, x)
    print(f"rt_argmin+take ({R}x{T}): {dt*1e3:7.2f} ms")

    # gather: winner-index row gather from a (T,3) table
    tbl = jnp.ones((T, 3), jnp.float32)
    idx = jnp.zeros((R,), jnp.int32)

    def f_gather(acc, tbl, idx):
        g = tbl[idx + acc.astype(jnp.int32)]
        return jnp.sum(g)
    dt = bench(f_gather, K, tbl, idx)
    print(f"row_gather (R from {T}x3): {dt*1e3:7.2f} ms")

    # one-hot matmul gather (R,4)@(4,15) pattern
    M = 4
    stacked = jnp.ones((M, 15), jnp.float32)
    mid = jnp.zeros((R,), jnp.int32)

    def f_oh(acc, stacked, mid):
        oh = (mid[:, None] == jnp.arange(M, dtype=jnp.int32)[None, :]
              ).astype(jnp.float32) + acc * 0
        g = jnp.matmul(oh, stacked, precision=jax.lax.Precision.HIGHEST)
        return jnp.sum(g)
    dt = bench(f_oh, K, stacked, mid)
    print(f"onehot_gather (Rx{M})@({M}x15) HIGHEST: {dt*1e3:7.2f} ms")


if __name__ == "__main__":
    main()

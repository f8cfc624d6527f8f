"""Marginal cost of a DEPENDENT in-jit stage (round-5 roofline note).

BASELINE.md's hardware table says a single (2^20, 43) min-sweep measures
2.57 ms ~= the serialized-iteration floor, while its pure VPU flop cost is
~0.6 ms.  Which one governs a CHAIN of dependent stages inside one jit
decides whether the flagship Cornell number is floor-bound (fewer, fatter
stages — i.e. a fused Pallas megakernel — would win) or compute-bound (XLA
is already at the roofline and Pallas-izing the flagship is pointless).

Method: one jitted function runs N data-dependent (R, P) Moller-Trumbore
min-sweeps (stage i+1's rays depend on stage i's min); time vs N fits a
line; the slope is the true marginal stage cost.  Prints JSON.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=1 << 20)
    ap.add_argument("--prims", type=int, default=43)
    ap.add_argument("--chain", default="2,4,8,16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from wc_path_tracer_tpu.ops import intersect as ix

    R, P = args.rays, args.prims
    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.normal(size=(R, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(R, 3)), jnp.float32)
    a = jnp.asarray(rng.normal(size=(P, 3)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(P, 3)), jnp.float32)
    c = jnp.asarray(rng.normal(size=(P, 3)), jnp.float32)

    def stage(o, d):
        t, hit = ix.ray_triangle_sweep(o, d, a, b, c)
        tmin = jnp.min(jnp.where(hit, t, np.float32(1e9)), axis=1)
        # next stage's rays DEPEND on this stage's result
        o2 = o + d * jnp.clip(tmin, 0.0, 1.0)[:, None]
        return o2, d

    results = []
    for n in (int(x) for x in args.chain.split(",")):

        @jax.jit
        def run(o, d, n=n):
            for _ in range(n):
                o, d = stage(o, d)
            return jnp.sum(o)

        float(run(o, d))  # compile
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            v = float(run(o, d))
            best = min(best, time.perf_counter() - t0)
        results.append((n, best))
        print(f"chain {n}: {best * 1e3:8.2f} ms", file=sys.stderr)

    ns = np.array([r[0] for r in results], np.float64)
    ts = np.array([r[1] for r in results], np.float64)
    slope, intercept = np.polyfit(ns, ts, 1)
    flops = 2.0 * R * P * 55  # ~55 flops/test, fwd only
    print(json.dumps({
        "rays": R, "prims": P,
        "marginal_stage_ms": round(slope * 1e3, 3),
        "intercept_ms": round(intercept * 1e3, 2),
        "implied_tflops": round(flops / slope / 2 / 1e12, 3),
        "rows": [{"chain": int(n), "ms": round(t * 1e3, 2)}
                 for n, t in results],
    }))


if __name__ == "__main__":
    main()

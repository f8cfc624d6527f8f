"""Measure the MT (VPU Moller-Trumbore) vs MXU (plane-form) cluster-sweep
kernels on the real TPU (round 5: the mesh-path 17x-gap attack after
RAY_BLOCK shrinking measured as a loss — BASELINE.md round 5).

Workload: bunny tables, three ray populations (primary, incoherent bounce
via direction shuffle, half-dead bounce), K repeats in one jitted scan.
Prints one JSON line per (variant, population).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--subdiv", type=int, default=5)
    ap.add_argument("--variants", default="mt,mxu")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from wc_path_tracer_tpu.kernels import cluster
    from wc_path_tracer_tpu.models.procedural import (bunny_gltf_scene,
                                                      bunny_like_scene)
    from wc_path_tracer_tpu.render import sweep as sweep_mod
    from wc_path_tracer_tpu.scene.camera import (camera_matrices,
                                                 primary_ray_directions)
    from wc_path_tracer_tpu.utils.config import RenderConfig

    if args.subdiv == 5:
        scene, cam = bunny_gltf_scene()
    else:
        scene, cam = bunny_like_scene(args.subdiv)
    mats = camera_matrices(cam, 1.0)
    W = H = args.size
    R = W * H
    o = jnp.broadcast_to(mats.position, (R, 3))
    d = primary_ray_directions(mats, W, H).reshape(-1, 3)
    cfg = RenderConfig(width=W, height=H)

    rng = np.random.default_rng(0)
    perm = jnp.asarray(rng.permutation(R))
    d_inc = d[perm]                      # incoherent "bounce" directions
    K = args.iters

    t_mt = cluster.build_cluster_tables(scene.mesh)
    t_mx = cluster.build_cluster_tables_mxu(scene.mesh)

    pops = {
        "primary": (o, d),
        "bounce": (o, d_inc),
    }

    for variant in args.variants.split(","):
        if variant == "mt":
            tris, cmin, cmax = t_mt
            mat_tbl = None
        else:
            tris, cmin, cmax, mat_tbl = t_mx

        for pop, (oo, dd) in pops.items():
            # Morton-sort like production (sweep._sort_permuter)
            fwd, _inv = sweep_mod._sort_permuter(oo, dd, cmin, cmax,
                                                 scene=scene)
            os_, ds_ = fwd(oo), fwd(dd)
            tinit = jnp.full((R,), cluster.KINF, jnp.float32)

            @jax.jit
            def run(os_, ds_, tinit):
                def body(acc, i):
                    pay = cluster.cluster_sweep(
                        os_, ds_ + acc * 0, tinit, tris, cmin, cmax,
                        variant=variant, mat_tbl=mat_tbl)
                    return jnp.sum(pay[:, 0] * 1e-9), None
                acc, _ = jax.lax.scan(body, jnp.float32(0),
                                      jnp.arange(K))
                return acc

            t0 = time.perf_counter()
            v = float(run(os_, ds_, tinit))
            compile_s = time.perf_counter() - t0
            best = 1e9
            for _ in range(2):
                t0 = time.perf_counter()
                v = float(run(os_, ds_, tinit))
                best = min(best, time.perf_counter() - t0)
            dt = best / K
            print(json.dumps({
                "variant": variant, "pop": pop,
                "query_ms": round(dt * 1e3, 2),
                "mrays": round(R / dt / 1e6, 2),
                "compile_s": round(compile_s, 1),
                "check": v,
            }), flush=True)


if __name__ == "__main__":
    main()

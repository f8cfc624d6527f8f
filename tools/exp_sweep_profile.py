"""Where does the cluster-sweep frame go?  (round-4 mesh-path analysis)

Times the sweep's two stages separately (XLA cull+sort vs Pallas cluster
walk) and reports active-cluster statistics per 512-ray block, for three
ray populations on the bunny scene:

- primary:   coherent camera rays (tile-permuted)
- bounce:    rays from real bounce-1 hit points with cosine-ish random
             directions (the incoherent wavefront case)
- bounce+dead: same with a dead fraction matching the bench's
             alive_fraction, sorted alive-major

Usage: python tools/exp_sweep_profile.py [--size 512] [--subdiv 5]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, K, *args):
    @jax.jit
    def run(*args):
        def body(acc, i):
            return acc + fn(acc * jnp.float32(0) + jnp.float32(1), *args), None
        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(K, dtype=jnp.uint32))
        return acc

    float(run(*args))
    best = 1e30
    for _ in range(2):
        t0 = time.perf_counter()
        v = float(run(*args))
        assert v == v
        best = min(best, time.perf_counter() - t0)
    return best / K


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--subdiv", type=int, default=5)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--dead-frac", type=float, default=0.57)
    args = ap.parse_args()

    from wc_path_tracer_tpu.kernels import cluster
    from wc_path_tracer_tpu.models.procedural import bunny_like_scene
    from wc_path_tracer_tpu.render import sweep as sweep_mod
    from wc_path_tracer_tpu.scene.camera import (camera_matrices,
                                                 primary_ray_directions)
    from wc_path_tracer_tpu.utils.config import RenderConfig

    scene, cam = bunny_like_scene(args.subdiv)
    size = args.size
    R = size * size
    cfg = RenderConfig(width=size, height=size)
    mats = camera_matrices(cam, 1.0)

    tables = cluster.build_cluster_tables(scene.mesh)
    tris, cmin, cmax = tables
    C = cmin.shape[0]
    print(f"profile: {R} rays, {scene.mesh.indices.shape[0]//3} tris, "
          f"{C} clusters, backend={jax.default_backend()}", file=sys.stderr)

    dirs = primary_ray_directions(mats, size, size).reshape(-1, 3)
    origin = jnp.broadcast_to(mats.position, (R, 3))

    # real bounce-1 population: primary hit points + random unit directions
    pay = jax.jit(cluster.cluster_sweep)(origin, dirs,
                                         jnp.full((R,), np.float32(np.inf)),
                                         tris, cmin, cmax)
    t_hit = np.asarray(pay[:, 0])
    hit = np.isfinite(t_hit)
    o_np = np.asarray(origin) + t_hit[:, None] * np.asarray(dirs)
    lo, hi = np.asarray(jnp.min(cmin, 0)), np.asarray(jnp.max(cmax, 0))
    rs = np.random.RandomState(0)
    # miss rays: re-root on a random hit point (mimics rays that scattered)
    fill = rs.choice(np.flatnonzero(hit), size=R)
    o_b = np.where(hit[:, None], o_np, o_np[fill])
    d_b = rs.normal(size=(R, 3)).astype(np.float32)
    d_b /= np.linalg.norm(d_b, axis=1, keepdims=True)
    dead = rs.rand(R) < args.dead_frac

    pops = {
        "primary": (origin, dirs, None),
        "bounce": (jnp.asarray(o_b, jnp.float32),
                   jnp.asarray(d_b, jnp.float32), None),
        "bounce+dead": (jnp.asarray(o_b, jnp.float32),
                        jnp.asarray(d_b, jnp.float32),
                        jnp.asarray(~dead)),
    }

    RB = R // cluster.RAY_BLOCK
    for name, (o, d, alive) in pops.items():
        for sort in (False, True):
            if sort:
                fwd, _ = sweep_mod._sort_permuter(o, d, cmin, cmax,
                                                  active=alive)
                o_s, d_s = fwd(o), fwd(d)
                alive_s = fwd(alive) if alive is not None else None
            else:
                o_s, d_s, alive_s = o, d, alive
            tinit = jnp.full((R,), np.float32(np.inf))
            if alive_s is not None:
                tinit = jnp.where(alive_s, tinit, -np.float32(np.inf))

            # active-cluster statistics from the cull
            @jax.jit
            def nact_stats(o, d, tinit):
                bt0, _ = cluster._cull(o, d, tinit, cmin, cmax, RB,
                                       cluster.RAY_BLOCK)
                nact = jnp.sum((bt0 < cluster.KINF).astype(jnp.int32), 1)
                return (jnp.mean(nact.astype(jnp.float32)),
                        jnp.max(nact))
            mean_na, max_na = map(float, nact_stats(o_s, d_s, tinit))

            # full sweep timing (cull + sort + kernel).  NOTE KINF is
            # FLT_MAX (finite!): guard by magnitude, not isfinite, or the
            # miss-lane sum overflows to inf and poisons the timing scan
            def f_sweep(one, o, d, tinit):
                p = cluster.cluster_sweep(o * one, d, tinit,
                                          tris, cmin, cmax)
                return jnp.sum(jnp.where(jnp.abs(p[:, 0]) < 1e30,
                                         p[:, 0], 0.0))
            dt_full = timed(f_sweep, args.iters, o_s, d_s, tinit)

            # cull + sort alone (XLA side of _sweep_chunk, no pallas)
            def f_cull(one, o, d, tinit):
                bt0, t_lim = cluster._cull(o * one, d, tinit, cmin, cmax,
                                           RB, cluster.RAY_BLOCK)
                nact = jnp.sum((bt0 < cluster.KINF).astype(jnp.int32), 1)
                order = jnp.argsort(bt0, axis=1)
                bt0s = jnp.take_along_axis(bt0, order, axis=1)
                return (jnp.sum(jnp.where(jnp.abs(bt0s) < 1e30, bt0s, 0.0))
                        + jnp.sum(nact.astype(jnp.float32))
                        + jnp.sum(jnp.where(jnp.abs(t_lim) < 1e30,
                                            t_lim, 0.0)))
            dt_cull = timed(f_cull, args.iters, o_s, d_s, tinit)

            print(json.dumps({
                "pop": name, "sorted": sort,
                "mean_active_clusters": round(mean_na, 1),
                "max_active_clusters": int(max_na),
                "cull_ms": round(dt_cull * 1e3, 2),
                "sweep_total_ms": round(dt_full * 1e3, 2),
                "kernel_ms_approx": round((dt_full - dt_cull) * 1e3, 2),
            }))


if __name__ == "__main__":
    main()

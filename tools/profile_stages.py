"""Stage-level honest timing of the golden render pipeline on the live backend.

Times each pipeline stage (intersect / material gather / RNG / full bounce /
full trace, fwd and fwd+bwd) as its own jitted lax.scan with a scalar
device-to-host readback (the only trustworthy sync on this backend — see
bench.py TIMING METHODOLOGY).  Output: one JSON line per stage to stdout.

Usage:  python tools/profile_stages.py [--size 1024] [--iters 5] [--scene cornell]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def timed_scan(fn, K, *args):
    """Run fn K times inside one jitted scan, chained so nothing elides.

    fn(carry_scalar, *args) -> scalar; returns best wall seconds per call.
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(*args):
        def body(acc, i):
            return acc + fn(acc * jnp.float32(0) + jnp.float32(1), i, *args), None
        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(K, dtype=jnp.uint32))
        return acc

    float(run(*args))  # compile + warmup
    best = 1e30
    for _ in range(2):
        t0 = time.perf_counter()
        v = float(run(*args))
        assert v == v
        best = min(best, time.perf_counter() - t0)
    return best / K


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--bounces", type=int, default=4)
    ap.add_argument("--scene", default="cornell")
    ap.add_argument("--stages", default="all",
                    help="comma list: intersect,gather,rng,bounce,trace,"
                         "trace_bwd,render")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from wc_path_tracer_tpu.models import builtin
    from wc_path_tracer_tpu.render import golden
    from wc_path_tracer_tpu.scene.camera import camera_matrices, \
        primary_ray_directions
    from wc_path_tracer_tpu.utils.config import RenderConfig
    from wc_path_tracer_tpu.ops import rng

    if args.scene == "cornell":
        scene, cam = builtin.cornell_box_scene()
        sky = "black"
    elif args.scene == "bunny":
        from wc_path_tracer_tpu.models.procedural import bunny_like_scene
        scene, cam = bunny_like_scene(5)
        sky = "gradient"
    else:
        scene, cam = builtin.default_scene(), builtin.default_camera()
        sky = "gradient"

    size = args.size
    cfg = RenderConfig(width=size, height=size, samples=1,
                       max_bounces=args.bounces, sky=sky)
    mats = camera_matrices(cam, 1.0)
    R = size * size
    SEG = args.bounces + 1

    print(f"profile: {size}x{size} ({R} rays), scene={args.scene}, "
          f"backend={jax.default_backend()}", file=sys.stderr)

    dirs = primary_ray_directions(mats, size, size).reshape(-1, 3)
    origin = jnp.broadcast_to(mats.position, (R, 3)) + dirs * jnp.float32(0)
    seed0 = rng.pixel_seed(jnp.arange(R, dtype=jnp.uint32), jnp.uint32(1))

    want = args.stages.split(",") if args.stages != "all" else [
        "intersect", "gather", "rng", "bounce", "trace", "trace_bwd"]
    results = {}

    if "intersect" in want:
        # SEG sequential intersects (data-chained like the bounce loop)
        def f(one, i, scene, origin, dirs):
            def body(carry, _):
                o, d = carry
                rec = golden.intersect_scene_brute(scene, o, d, cfg)
                o = rec.p + d * jnp.float32(1e-6)
                return (o, d), None
            (o, d), _ = jax.lax.scan(body, (origin * one, dirs), None,
                                     length=SEG)
            return jnp.sum(o)
        dt = timed_scan(f, args.iters, scene, origin, dirs)
        results["intersect_x%d" % SEG] = dt

    if "gather" in want:
        mid = (jnp.arange(R, dtype=jnp.int32)
               % scene.materials.capacity)

        def f(one, i, scene, mid):
            def body(carry, _):
                m = golden._gather_material(scene.materials,
                                            (mid + carry.astype(jnp.int32))
                                            % scene.materials.capacity)
                return mid * 0 + m["albedo"][:, 0].astype(jnp.int32), None
            c, _ = jax.lax.scan(body, mid, None, length=SEG)
            return jnp.sum(c.astype(jnp.float32)) * one
        dt = timed_scan(f, args.iters, scene, mid)
        results["gather_x%d" % SEG] = dt

    if "rng" in want:
        def f(one, i, seed0):
            def body(seed, _):
                mask = seed > jnp.uint32(1)
                _, seed = rng.rand_masked(seed, mask)
                _, seed = rng.rand_masked(seed, mask)
                _, seed = rng.rand_masked(seed, mask)
                d, seed = rng.random_direction(seed, mask)
                return seed + d[:, 0].astype(jnp.uint32), None
            s, _ = jax.lax.scan(body, seed0, None, length=SEG)
            return jnp.sum(s.astype(jnp.float32)) * one
        dt = timed_scan(f, args.iters, seed0)
        results["rng_x%d" % SEG] = dt

    if "bounce" in want or "trace" in want:
        def f(one, i, scene, origin, dirs, seed0):
            total, _ = golden.trace_rays(scene, origin * one, dirs,
                                         seed0 + i, cfg)
            return jnp.sum(total)
        dt = timed_scan(f, args.iters, scene, origin, dirs, seed0)
        results["trace_fwd"] = dt

    if "trace_bwd" in want:
        def loss(albedo, scene, origin, dirs, seed0, i):
            import dataclasses
            m = dataclasses.replace(scene.materials, albedo=albedo)
            s = dataclasses.replace(scene, materials=m)
            total, _ = golden.trace_rays(s, origin, dirs, seed0 + i, cfg)
            return jnp.mean(total)

        def f(one, i, scene, origin, dirs, seed0):
            l, g = jax.value_and_grad(loss)(scene.materials.albedo * one,
                                            scene, origin, dirs, seed0, i)
            return l + jnp.sum(g)
        dt = timed_scan(f, args.iters, scene, origin, dirs, seed0)
        results["trace_fwd_bwd"] = dt

    for k, v in results.items():
        mrays = R * SEG / v / 1e6 if "trace" in k or "intersect" in k else None
        print(json.dumps({"stage": k, "ms": round(v * 1e3, 2),
                          "mrays": round(mrays, 1) if mrays else None}))


if __name__ == "__main__":
    main()

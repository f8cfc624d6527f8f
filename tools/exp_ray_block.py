"""Measure cluster-sweep ray_block tradeoff on the real TPU (VERDICT r4
ask #2: the round-4 'parked' RAY_BLOCK<512 redesign, now built via per-block
SMEM active-list slices).

Runs the production bunny config (512^2, 21.8k tris, 4 bounces, dynamic ray
sort) fwd+bwd at several ray_block values and prints one JSON line per
value.  BASELINE.md round-5 records the winner, which becomes the
RenderConfig default.

Usage: python tools/exp_ray_block.py [--blocks 512,256,128,64] [--fwd-only]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def float_timed(fn, *args):
    t0 = time.perf_counter()
    v = float(fn(*args))
    assert v == v, "NaN in timed computation"
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", default="512,256,128,64")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--bounces", type=int, default=4)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--fwd-only", action="store_true")
    ap.add_argument("--subdiv", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from wc_path_tracer_tpu.models.procedural import (bunny_gltf_scene,
                                                      bunny_like_scene)
    from wc_path_tracer_tpu.render import sweep
    from wc_path_tracer_tpu.scene.camera import camera_matrices
    from wc_path_tracer_tpu.utils.config import RenderConfig

    if args.subdiv == 5:
        scene, cam = bunny_gltf_scene()
    else:
        scene, cam = bunny_like_scene(args.subdiv)
    mats = camera_matrices(cam, 1.0)
    target = jnp.zeros((args.size, args.size, 3), jnp.float32)
    trainable = ("albedo", "emission", "emission_strength", "roughness")
    K = args.iters

    for rb in (int(b) for b in args.blocks.split(",")):
        cfg = RenderConfig(width=args.size, height=args.size, samples=1,
                           max_bounces=args.bounces, sky="gradient",
                           ray_block=rb)

        if args.fwd_only:
            def frame_scalar(scene, mats, frame, target, cfg=cfg):
                return jnp.sum(sweep.render_frame(scene, mats, cfg, frame))
        else:
            def loss_fn(params, scene, mats, frame, target, cfg=cfg):
                m = dataclasses.replace(scene.materials, **params)
                s = dataclasses.replace(scene, materials=m)
                img = sweep.render_frame(s, mats, cfg, frame)
                return jnp.mean((img - target) ** 2)

            def frame_scalar(scene, mats, frame, target, loss_fn=loss_fn):
                params = {k: getattr(scene.materials, k) for k in trainable}
                loss, grads = jax.value_and_grad(loss_fn)(
                    params, scene, mats, frame, target)
                return loss + sum(jnp.sum(g)
                                  for g in jax.tree.leaves(grads))

        @jax.jit
        def run(scene, mats, target, frame_scalar=frame_scalar):
            def body(acc, frame):
                return acc + frame_scalar(scene, mats, frame, target), None
            acc, _ = jax.lax.scan(body, jnp.float32(0),
                                  jnp.arange(1, K + 1, dtype=jnp.uint32))
            return acc

        t0 = time.perf_counter()
        try:
            v0 = float(run(scene, mats, target))
        except Exception as e:
            print(json.dumps({"ray_block": rb, "error": str(e)[:200]}))
            continue
        compile_s = time.perf_counter() - t0
        best = min(float_timed(run, scene, mats, target) for _ in range(2))
        dt = best / K
        segs = args.size * args.size * (args.bounces + 1)
        print(json.dumps({
            "ray_block": rb,
            "mode": "fwd" if args.fwd_only else "fwd+bwd",
            "frame_ms": round(dt * 1e3, 2),
            "mrays": round(segs / dt / 1e6, 3),
            "compile_s": round(compile_s, 1),
            "check": v0,
        }), flush=True)


if __name__ == "__main__":
    main()

"""Experiment: backward-pass cost of the bounce scan under remat policies.

Variants: plain scan (all residuals saved), jax.checkpoint per bounce
(recompute everything), checkpoint with dots-saveable policy (save MXU
outputs, recompute elementwise).
"""

from __future__ import annotations

import sys
import time
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from wc_path_tracer_tpu.models import builtin  # noqa: E402
from wc_path_tracer_tpu.render import golden  # noqa: E402
from wc_path_tracer_tpu.scene.camera import camera_matrices, \
    primary_ray_directions  # noqa: E402
from wc_path_tracer_tpu.utils.config import RenderConfig  # noqa: E402
from wc_path_tracer_tpu.ops import rng  # noqa: E402

F32 = np.float32


def make_trace(cfg, remat):
    def bounce(carry, _):
        return golden._bounce_segment(
            None, cfg, golden.intersect_scene_brute, carry), None

    def trace(scene, origin, direction, seed):
        def bounce(carry, _):
            return golden._bounce_segment(
                scene, cfg, golden.intersect_scene_brute, carry), None
        if remat == "full" or remat == "full_u":
            bounce = jax.checkpoint(bounce)
        elif remat in ("dots", "dots_u"):
            bounce = jax.checkpoint(
                bounce,
                policy=jax.checkpoint_policies.dots_saveable)
        elif remat in ("nothing", "nothing_u"):
            bounce = jax.checkpoint(
                bounce, policy=jax.checkpoint_policies.nothing_saveable)
        unroll = cfg.max_bounces + 1 if remat.endswith("_u") else 1
        (o, d, total, trans, seed, alive, prev_nee, _), _ = jax.lax.scan(
            bounce, golden._initial_carry(origin, direction, seed),
            None, length=cfg.max_bounces + 1, unroll=unroll)
        return total, seed
    return trace


def bench(fn, K, *args):
    @jax.jit
    def run(*args):
        def body(acc, i):
            return acc + fn(i, *args), None
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
    scene, cam = builtin.cornell_box_scene()
    size = 1024
    cfg = RenderConfig(width=size, height=size, samples=1, max_bounces=4,
                       sky="black")
    mats = camera_matrices(cam, 1.0)
    R = size * size
    dirs = primary_ray_directions(mats, size, size).reshape(-1, 3)
    origin = jnp.broadcast_to(mats.position, (R, 3)) + dirs * F32(0)
    seed0 = rng.pixel_seed(jnp.arange(R, dtype=jnp.uint32), jnp.uint32(1))
    K = 5

    for remat in ["none_u", "dots", "dots_u", "nothing_u"]:
        trace = make_trace(cfg, remat)

        def loss(albedo, scene, origin, dirs, seed0, i):
            m = dataclasses.replace(scene.materials, albedo=albedo)
            s = dataclasses.replace(scene, materials=m)
            total, _ = trace(s, origin, dirs, seed0 + i.astype(jnp.uint32))
            return jnp.mean(total)

        def f(i, scene, origin, dirs, seed0):
            l, g = jax.value_and_grad(loss)(scene.materials.albedo, scene,
                                            origin, dirs, seed0, i)
            return l + jnp.sum(g)

        dt = bench(f, K, scene, origin, dirs, seed0)
        seg = R * (cfg.max_bounces + 1)
        print(f"remat={remat:8s} {dt*1e3:8.2f} ms   "
              f"{seg/dt/1e6:7.1f} Mrays/s fwd+bwd")


if __name__ == "__main__":
    main()

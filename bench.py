"""Benchmark harness: Mrays/s/chip forward+backward on the 1024 Cornell config.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The reference publishes no numbers (BASELINE.md), so vs_baseline compares
against the first recorded measurement of this framework (stored in
BASELINE.md's measured table); until one exists it is 1.0.

Rays counted = path segments launched = W*H*samples*(max_bounces+1)
(the reference dispatches every pixel-thread through every bounce segment;
SURVEY §3.3).  fwd+bwd = value_and_grad of an L2 image loss w.r.t. material
parameters, matching BASELINE.json's metric definition.

TIMING METHODOLOGY (round 2, load-bearing): on this image's remote-tunneled
"axon" TPU backend, ``jax.block_until_ready`` returns WITHOUT waiting for
device completion, which silently inflated every earlier wall-clock number
by up to ~5000x (BASELINE.md "round-2 re-baseline").  The only trustworthy
measurement is a device-to-host readback of a value that data-depends on
the full computation.  This harness therefore runs ``--iters`` frames
INSIDE one jitted ``lax.scan`` (one dispatch, so per-call tunnel overhead
~40ms amortizes away), reduces each frame to a scalar that depends on every
output, and times ``float()`` of the result.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="small CPU-friendly smoke config")
    ap.add_argument("--size", type=int, default=None, help="image size override")
    ap.add_argument("--samples", type=int, default=1)
    ap.add_argument("--bounces", type=int, default=4)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--forward-only", action="store_true")
    ap.add_argument("--renderer", default="auto",
                    choices=["auto", "golden", "wavefront", "pallas", "sweep"],
                    help="render path to benchmark")
    ap.add_argument("--scene", default="cornell",
                    choices=["cornell", "bunny", "default", "triangle", "bsdf"],
                    help="benchmark scene (BASELINE config ladder)")
    ap.add_argument("--nee", action="store_true",
                    help="next-event estimation (config b)")
    ap.add_argument("--rr", action="store_true",
                    help="Russian roulette termination (config d)")
    ap.add_argument("--compact", action="store_true",
                    help="alive-ray stream compaction between bounces")
    ap.add_argument("--compact-blocks", type=int, default=16)
    ap.add_argument("--subdiv", type=int, default=5,
                    help="bunny mesh subdivision level (20*4^n tris)")
    ap.add_argument("--row-chunks", type=int, default=0,
                    help="frame row-banding per dispatch (0 = auto; "
                         "BASELINE.md round 5)")
    ap.add_argument("--ray-sort", default="dynamic",
                    choices=["static", "dynamic", "off"],
                    help="ray regrouping before the cluster sweep "
                         "(default matches utils/config.py production "
                         "default — VERDICT r4 weak #6)")
    args = ap.parse_args()

    import os
    # Persistent executable cache: BENCH_r04 recorded an 18-minute compile
    # for the 1024^2 unrolled fwd+bwd jit (the runtime-optimal unroll=True
    # bounce loop trades compile time for the measured 2.4x runtime win,
    # render/golden.py trace_rays).  The cache makes every RE-compile of an
    # unchanged graph ~free across processes/rounds (verified on this
    # backend: 2nd-process compile 110 s -> 1.7 s).  BASELINE.md round 5.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", cache_dir)

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    import jax.numpy as jnp

    from wc_path_tracer_tpu.models import builtin
    from wc_path_tracer_tpu.scene.camera import camera_matrices
    from wc_path_tracer_tpu.utils.config import RenderConfig

    size = args.size or (128 if args.small else 1024)
    if args.scene == "cornell":
        scene, cam = builtin.cornell_box_scene()
        sky = "black"
    elif args.scene == "bunny":
        from wc_path_tracer_tpu.models.procedural import (bunny_gltf_scene,
                                                          bunny_like_scene)
        # the pallas packet kernel needs sub-BLAS draws within its SMEM budget
        blas = None
        if args.renderer == "pallas":
            from wc_path_tracer_tpu.render.dispatch import PALLAS_MAX_TRIS
            blas = PALLAS_MAX_TRIS
        if args.subdiv == 5:
            # config (c) proper: the committed glTF asset via models/gltf.py
            scene, cam = bunny_gltf_scene(max_blas_tris=blas)
        else:
            scene, cam = bunny_like_scene(args.subdiv, max_blas_tris=blas)
        sky = "gradient"
    elif args.scene == "triangle":
        scene, cam = builtin.single_triangle_scene()
        sky = "black"
    elif args.scene == "bsdf":
        scene, cam = builtin.full_bsdf_scene()
        sky = "black"
    else:
        scene, cam = builtin.default_scene(), builtin.default_camera()
        sky = "gradient"
    cfg = RenderConfig(width=size, height=size, samples=args.samples,
                       max_bounces=args.bounces, sky=sky,
                       use_nee=args.nee, use_rr=args.rr,
                       compact=args.compact,
                       compact_blocks=args.compact_blocks,
                       ray_sort=args.ray_sort, row_chunks=args.row_chunks)
    mats = camera_matrices(cam, 1.0)

    from wc_path_tracer_tpu.render import dispatch
    render_frame = dispatch.get_render_frame(args.renderer, scene, cfg)

    # NOTE: every device array must be an ARGUMENT of the jitted function.
    # A large array captured as a closure constant permanently degrades this
    # environment's remote-TPU session (~30ms flat penalty on every later
    # dispatch) — and baked-in constants are bad practice on real TPU pods
    # too (they bloat executables and defeat donation).
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)

    if args.forward_only:
        def frame_scalar(scene, mats, frame, target):
            # scalar depending on every pixel: forces real device completion
            return jnp.sum(render_frame(scene, mats, cfg, frame))
    else:
        trainable = ("albedo", "emission", "emission_strength", "roughness")

        def loss_fn(params, scene, mats, frame, target):
            m = dataclasses.replace(scene.materials, **params)
            s = dataclasses.replace(scene, materials=m)
            img = render_frame(s, mats, cfg, frame)
            return jnp.mean((img - target) ** 2)

        def frame_scalar(scene, mats, frame, target):
            params = {k: getattr(scene.materials, k) for k in trainable}
            loss, grads = jax.value_and_grad(loss_fn)(params, scene, mats,
                                                      frame, target)
            # fold every gradient in so nothing dead-code-eliminates
            return loss + sum(jnp.sum(g) for g in jax.tree.leaves(grads))

    K = max(args.iters, 1)

    @jax.jit
    def run(scene, mats, target):
        # all K frames inside ONE dispatch; carry the accumulator through
        # lax.scan so frames serialize on device and none can be elided
        def body(acc, frame):
            return acc + frame_scalar(scene, mats, frame, target), None
        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(1, K + 1, dtype=jnp.uint32))
        return acc

    print(f"bench: {size}x{size}, samples={cfg.samples}, "
          f"bounces={cfg.max_bounces}, renderer={args.renderer}, "
          f"fwd_only={args.forward_only}, iters(in-jit)={K}, "
          f"backend={jax.default_backend()}",
          file=sys.stderr)

    # compile + warm up (float() is the only honest sync on this backend)
    t0 = time.perf_counter()
    float(run(scene, mats, target))
    print(f"bench: compile+first run {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    best = min(float_timed(run, scene, mats, target) for _ in range(2))
    dt = best / K

    segments = cfg.width * cfg.height * cfg.samples * (cfg.max_bounces + 1)
    mrays = segments / dt / 1e6
    mode = "fwd" if args.forward_only else "fwd+bwd"

    # vs_baseline: ratio to the first recorded measurement in BASELINE.md
    # (the reference publishes none). 1.0 when no prior record exists.
    baseline = _read_recorded_baseline(mode, size, args.scene)
    vs = mrays / baseline if baseline else 1.0

    record = {
        "metric": f"Mrays/s/chip {mode} ({size}^2 {args.scene}, {cfg.max_bounces} bounces)",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(vs, 3),
    }

    # honest-denominator companion: Mrays/s counting only ALIVE segments
    # (post-RR/miss); identical to the dispatch number when nothing
    # terminates early (VERDICT round-2 weak #5)
    from wc_path_tracer_tpu.render import golden
    try:
        alive = int(jax.jit(golden.count_alive_segments,
                            static_argnames="cfg")(scene, mats, cfg,
                                                   jnp.uint32(1)))
        record["alive_fraction"] = round(alive / segments, 4)
        record["alive_mrays"] = round(mrays * alive / segments, 3)
    except Exception as e:  # diagnostic only — never fail the bench row
        print(f"bench: alive-segment count failed: {e}", file=sys.stderr)

    # BVH-path row: the flagship bench must also exercise the meshed-scene
    # traversal path (VERDICT round-2 ask #9) — measured as a sub-record of
    # the single driver-visible JSON line
    if args.scene == "cornell" and not args.small and args.renderer == "auto":
        try:
            record["bvh_row"] = _bvh_row(args)
        except Exception as e:
            print(f"bench: bvh row failed: {e}", file=sys.stderr)
        # config-(d) row: full BSDF set + Russian roulette, 8 bounces
        # (VERDICT r3 ask #7); compact default per the recorded decision
        # in BASELINE.md round-4 section
        try:
            record["bsdf_row"] = _bsdf_row()
        except Exception as e:
            print(f"bench: bsdf row failed: {e}", file=sys.stderr)
        # scaling-efficiency row (VERDICT r3 ask #6): per-device efficiency
        # of 8-way DP ray sharding measured as band-height scaling on the
        # one real chip — forward comm is zero under replicated-scene DP,
        # so T(H/8 band) IS the per-device wall-clock at N=8
        # (tools/exp_scaling.py holds the full 1-2-4-8 curve)
        if not args.forward_only:
            try:
                strong, weak = _scaling_at(8, scene, mats, cfg, dt)
                record["scaling_efficiency_8"] = strong
                record["scaling_weak_8"] = weak
            except Exception as e:
                print(f"bench: scaling row failed: {e}", file=sys.stderr)

    print(json.dumps(record))


def _bsdf_row():
    """1024^2 full-BSDF scene, 8 bounces, RR, fwd+bwd (config d)."""
    import jax
    import jax.numpy as jnp

    from wc_path_tracer_tpu.models import builtin
    from wc_path_tracer_tpu.render import dispatch, golden
    from wc_path_tracer_tpu.scene.camera import camera_matrices
    from wc_path_tracer_tpu.utils.config import RenderConfig

    scene, cam = builtin.full_bsdf_scene()
    cfg = RenderConfig(width=1024, height=1024, samples=1, max_bounces=8,
                       sky="black", use_rr=True, compact=COMPACT_CONFIG_D)
    mats = camera_matrices(cam, 1.0)
    render_frame = dispatch.get_render_frame("auto", scene, cfg)
    run = _fwd_bwd_scan(render_frame, cfg, K=3)
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    float(run(scene, mats, target))
    best = min(float_timed(run, scene, mats, target) for _ in range(2))
    segments = cfg.width * cfg.height * (cfg.max_bounces + 1)
    row = {
        "metric": "Mrays/s/chip fwd+bwd (1024^2 full-BSDF, 8 bounces, RR,"
                  f" compact={'on' if COMPACT_CONFIG_D else 'off'})",
        "value": round(segments / (best / 3) / 1e6, 3),
        "unit": "Mrays/s",
    }
    try:
        alive = int(jax.jit(golden.count_alive_segments,
                            static_argnames="cfg")(scene, mats, cfg,
                                                   jnp.uint32(1)))
        row["alive_fraction"] = round(alive / segments, 4)
        row["alive_mrays"] = round(row["value"] * alive / segments, 3)
    except Exception:
        pass
    return row


COMPACT_CONFIG_D = False  # decision recorded in BASELINE.md round-4 section


def _fwd_bwd_scan(render_frame, cfg, K):
    """Jitted K-frame fwd+bwd scan (material-gradient loss, scalar out)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    trainable = ("albedo", "emission", "emission_strength", "roughness")

    def loss_fn(params, scene, mats, frame, target):
        m = dataclasses.replace(scene.materials, **params)
        s = dataclasses.replace(scene, materials=m)
        img = render_frame(s, mats, cfg, frame)
        return jnp.mean((img - target) ** 2)

    @jax.jit
    def run(scene, mats, target):
        def body(acc, frame):
            params = {k: getattr(scene.materials, k) for k in trainable}
            loss, grads = jax.value_and_grad(loss_fn)(
                params, scene, mats, frame, target)
            return acc + loss + sum(jnp.sum(g)
                                    for g in jax.tree.leaves(grads)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(1, K + 1, dtype=jnp.uint32))
        return acc

    return run


def _scaling_at(n: int, scene, mats, cfg, dt_full: float):
    """Per-device DP efficiency at mesh size n: T(full)/(n*T(H/n band)).

    Band rendering is exactly what each of n devices executes under
    parallel/render.py's row sharding (zero forward collectives), so the
    band wall-clock on the one real chip is the per-device wall-clock of
    an n-chip DP render of the same frame.

    Measured under the PRODUCTION dispatch policy: each jitted step
    renders ``n`` frames of the band (vmapped — sample batching), so
    per-op vector work stays constant as the band shrinks instead of
    sinking into this backend's ~2.5 ms serialized-stage floor.  That is
    what a progressive renderer/trainer actually dispatches; the round-4
    number (0.63) measured the 1-frame-per-dispatch anti-pattern
    (VERDICT r4 ask #1 / BASELINE.md round 5; tools/exp_scaling.py holds
    the full naive-vs-batched curve + the weak-scaling row).
    """
    import dataclasses

    import jax
    import jax.numpy as jnp

    from wc_path_tracer_tpu.render import golden

    band = cfg.height // n
    batch = n
    trainable = ("albedo", "emission", "emission_strength", "roughness")

    def loss_fn(params, scene, mats, frame, target):
        m = dataclasses.replace(scene.materials, **params)
        s = dataclasses.replace(scene, materials=m)

        def one(f):
            img = golden.render_rows(s, mats, cfg, f, jnp.uint32(0), band)
            return jnp.mean((img - target[:band]) ** 2)

        frames = frame + jnp.arange(batch, dtype=jnp.uint32)
        return jnp.mean(jax.vmap(one)(frames))

    K = 5

    @jax.jit
    def run(scene, mats, target):
        def body(acc, frame):
            params = {k: getattr(scene.materials, k) for k in trainable}
            loss, grads = jax.value_and_grad(loss_fn)(
                params, scene, mats, frame, target)
            return acc + loss + sum(jnp.sum(g)
                                    for g in jax.tree.leaves(grads)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(1, K + 1, dtype=jnp.uint32)
                              * jnp.uint32(batch))
        return acc

    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    float(run(scene, mats, target))
    times = sorted(float_timed(run, scene, mats, target) for _ in range(5))
    best = times[0]
    strong = round(dt_full / (n * best / (K * batch)), 4)
    # weak-scaling companion (VERDICT r4 ask #1a): under replicated-scene
    # DP each device's graph is IDENTICAL at every N (zero forward comm;
    # the ~1 KB grad psum is O(us)), so the N-device weak efficiency IS
    # the run-to-run repeatability of this fixed per-device band
    weak = round(times[0] / times[-2], 4)
    return strong, weak


def _bvh_row(args):
    """512^2 bunny (21.8k tris) fwd+bwd through the cluster-sweep path."""
    import jax
    import jax.numpy as jnp
    import dataclasses

    from wc_path_tracer_tpu.models.procedural import bunny_gltf_scene
    from wc_path_tracer_tpu.render import dispatch
    from wc_path_tracer_tpu.scene.camera import camera_matrices
    from wc_path_tracer_tpu.utils.config import RenderConfig

    scene, cam = bunny_gltf_scene()   # config (c): committed glTF asset
    cfg = RenderConfig(width=512, height=512, samples=1, max_bounces=4,
                       sky="gradient")
    mats = camera_matrices(cam, 1.0)
    render_frame = dispatch.get_render_frame("auto", scene, cfg)
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    trainable = ("albedo", "emission", "emission_strength", "roughness")

    def loss_fn(params, scene, mats, frame, target):
        m = dataclasses.replace(scene.materials, **params)
        s = dataclasses.replace(scene, materials=m)
        img = render_frame(s, mats, cfg, frame)
        return jnp.mean((img - target) ** 2)

    K = 3

    @jax.jit
    def run(scene, mats, target):
        def body(acc, frame):
            params = {k: getattr(scene.materials, k) for k in trainable}
            loss, grads = jax.value_and_grad(loss_fn)(
                params, scene, mats, frame, target)
            return acc + loss + sum(jnp.sum(g)
                                    for g in jax.tree.leaves(grads)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(1, K + 1, dtype=jnp.uint32))
        return acc

    float(run(scene, mats, target))
    best = min(float_timed(run, scene, mats, target) for _ in range(2))
    segments = cfg.width * cfg.height * (cfg.max_bounces + 1)
    return {
        "metric": "Mrays/s/chip fwd+bwd (512^2 bunny-21.8k-tris, 4 bounces,"
                  " cluster-sweep)",
        "value": round(segments / (best / K) / 1e6, 3),
        "unit": "Mrays/s",
    }


def float_timed(fn, *args):
    import time
    t0 = time.perf_counter()
    v = float(fn(*args))
    assert v == v, "NaN in benched computation"
    return time.perf_counter() - t0


def _read_recorded_baseline(mode: str, size: int, scene: str = "cornell"):
    """First recorded number for this config in BASELINE.md, if any."""
    try:
        with open("BASELINE.md") as f:
            for line in f:
                if line.startswith("<!-- bench-baseline"):
                    # format: <!-- bench-baseline mode=fwd+bwd size=1024 scene=cornell value=NN -->
                    parts = dict(p.split("=") for p in line.split()
                                 if "=" in p)
                    if (parts.get("mode") == mode
                            and int(parts.get("size", 0)) == size
                            and parts.get("scene", "cornell") == scene):
                        return float(parts["value"].rstrip("->").rstrip())
    except (OSError, ValueError):
        pass
    return None


if __name__ == "__main__":
    main()

"""Command-line interface.

The reference has no CLI at all — it is an interactive editor with hardcoded
defaults (SURVEY §5 config entry).  The CLI exposes the same capabilities
headlessly:

    python -m wc_path_tracer_tpu render --scene cornell --nee --frames 16 \
        --out cornell.png
    python -m wc_path_tracer_tpu render --obj model.obj --frames 8 --out m.png
    python -m wc_path_tracer_tpu invert --steps 100 --out-dir /tmp/inv
    python -m wc_path_tracer_tpu info
"""

from __future__ import annotations

import argparse
import sys
import time


def _add_render_args(p):
    p.add_argument("--scene", default="default",
                   choices=["default", "cornell", "triangle", "bunny"])
    p.add_argument("--obj", help="render an OBJ file instead of a builtin scene")
    p.add_argument("--gltf", help="render a glTF file instead of a builtin scene")
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--samples", type=int, default=1)
    p.add_argument("--bounces", type=int, default=4)
    p.add_argument("--nee", action="store_true", help="next-event estimation")
    p.add_argument("--mis", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="balance-heuristic MIS under NEE (--no-mis restores "
                        "the skip-emission-after-NEE estimator)")
    p.add_argument("--rr", action="store_true", help="Russian roulette")
    p.add_argument("--jitter", action="store_true", help="subpixel AA jitter")
    p.add_argument("--edge-grads", action="store_true",
                   help="silhouette (visibility) gradients via the coverage "
                        "estimator; also antialiases sphere edges (~2x cost)")
    p.add_argument("--compact", action="store_true",
                   help="alive-ray stream compaction between bounces")
    p.add_argument("--true-dielectric", action="store_true",
                   help="fix reference quirk 3: glass renders as dielectric")
    p.add_argument("--renderer", default="auto",
                   choices=["auto", "golden", "sweep", "wavefront", "pallas"],
                   help="closest-hit backend: auto picks brute below 256 "
                        "tris, the cluster sweep above (the production "
                        "meshed path)")
    p.add_argument("--bloom", action="store_true",
                   help="bloom post pass (ref ships bloom.comp but never "
                        "dispatches it)")
    p.add_argument("--bloom-threshold", type=float, default=1.0)
    p.add_argument("--bloom-knee", type=float, default=0.1)
    p.add_argument("--bloom-strength", type=float, default=1.0)


def _build_scene(args):
    from wc_path_tracer_tpu.models import builtin
    if args.obj:
        return builtin.mesh_scene(args.obj)
    if args.gltf:
        from wc_path_tracer_tpu.models.gltf import gltf_scene
        return gltf_scene(args.gltf)
    if args.scene == "cornell":
        return builtin.cornell_box_scene()
    if args.scene == "triangle":
        return builtin.single_triangle_scene()
    if args.scene == "bunny":
        from wc_path_tracer_tpu.models.procedural import bunny_like_scene
        return bunny_like_scene()
    return (builtin.default_scene(true_dielectric=args.true_dielectric),
            builtin.default_camera())


def _make_cfg(args, sky):
    from wc_path_tracer_tpu.utils.config import RenderConfig
    return RenderConfig(width=args.width, height=args.height,
                        samples=args.samples, max_bounces=args.bounces,
                        sky=sky, use_nee=args.nee, mis=args.mis,
                        use_rr=args.rr, pixel_jitter=args.jitter,
                        edge_grads=args.edge_grads, compact=args.compact,
                        bloom=args.bloom,
                        bloom_threshold=args.bloom_threshold,
                        bloom_knee=args.bloom_knee,
                        bloom_strength=args.bloom_strength)


def cmd_render(args):
    import jax.numpy as jnp

    from wc_path_tracer_tpu.render import golden
    from wc_path_tracer_tpu.render.dispatch import get_render_frame
    from wc_path_tracer_tpu.render.renderer import Renderer
    from wc_path_tracer_tpu.utils.metrics import MetricsLogger, mrays

    scene, cam = _build_scene(args)
    sky = "black" if args.scene in ("cornell", "triangle") and not args.obj else "gradient"
    cfg = _make_cfg(args, sky)

    render_frame = get_render_frame(args.renderer, scene, cfg)
    import jax

    @jax.jit
    def step_fn(scene, mats, cfg_frame, old):
        return golden.accumulate(old, render_frame(scene, mats, cfg, cfg_frame),
                                 cfg_frame)

    r = Renderer(scene, cam, cfg,
                 render_fn=lambda s, m, c, f, old: step_fn(s, m, f, old))
    if args.resume:
        from wc_path_tracer_tpu.utils.checkpoint import load_renderer
        load_renderer(args.resume, r)
        print(f"resumed at frame {r.frame_count}", file=sys.stderr)

    log = MetricsLogger(args.metrics)

    # honest-denominator companion (bench.py's lesson, VERDICT r3 weak #7):
    # fraction of dispatched lane-segments actually alive (post-miss/RR)
    try:
        from wc_path_tracer_tpu.scene.camera import camera_matrices
        segments = cfg.width * cfg.height * cfg.samples * (cfg.max_bounces + 1)
        alive_frac = float(jax.jit(
            golden.count_alive_segments, static_argnames="cfg")(
                scene, camera_matrices(cam, cfg.width / cfg.height), cfg,
                jnp.uint32(1))) / segments
    except Exception as e:
        print(f"alive-segment count unavailable: {e}", file=sys.stderr)
        alive_frac = None

    t0 = time.perf_counter()
    for i in range(args.frames):
        ft = time.perf_counter()
        r.step(1)
        r.image.block_until_ready()
        dt = time.perf_counter() - ft
        dispatched = mrays(cfg.width, cfg.height, cfg.samples,
                           cfg.max_bounces, dt)
        rec = dict(frame=r.frame_count, seconds=round(dt, 4),
                   mrays_per_s=round(dispatched, 2))
        if alive_frac is not None:
            rec["alive_fraction"] = round(alive_frac, 4)
            rec["alive_mrays_per_s"] = round(dispatched * alive_frac, 2)
        log.log("frame", **rec)
    print(f"rendered {args.frames} frames in {time.perf_counter()-t0:.2f}s",
          file=sys.stderr)

    if args.checkpoint:
        from wc_path_tracer_tpu.utils.checkpoint import save_renderer
        save_renderer(args.checkpoint, r)
        print(f"checkpoint -> {args.checkpoint}", file=sys.stderr)
    r.save_png(args.out, tonemap=args.tonemap, gamma=args.gamma)
    print(f"wrote {args.out}", file=sys.stderr)

    if args.debug_bvh:
        # BVH wireframe overlay — the capability the reference wires up but
        # ships commented out (src/editor.jai:159-171); here it is live
        import numpy as np

        from wc_path_tracer_tpu.io.image import write_png
        from wc_path_tracer_tpu.render.debug import draw_aabb_overlay
        from wc_path_tracer_tpu.scene.camera import camera_matrices
        mats = camera_matrices(r.camera, cfg.width / cfg.height)
        over = draw_aabb_overlay(np.asarray(r.image), mats,
                                 r.scene.mesh.bvh_min, r.scene.mesh.bvh_max)
        write_png(args.debug_bvh,
                  (np.clip(over, 0.0, 1.0) * 255.0).astype(np.uint8))
        print(f"wrote BVH overlay {args.debug_bvh}", file=sys.stderr)


def cmd_invert(args):
    import dataclasses

    import jax.numpy as jnp

    from wc_path_tracer_tpu.models import builtin
    from wc_path_tracer_tpu.optim.inverse import (InverseRenderConfig,
                                                  run_inverse_rendering)
    from wc_path_tracer_tpu.parallel import mesh as pmesh
    from wc_path_tracer_tpu.render import golden
    from wc_path_tracer_tpu.scene.camera import camera_matrices
    from wc_path_tracer_tpu.utils.metrics import MetricsLogger

    scene, cam = _build_scene(args)
    sky = "black" if args.scene in ("cornell", "triangle") else "gradient"
    cfg = _make_cfg(args, sky)
    mats = camera_matrices(cam, cfg.width / cfg.height)

    import numpy as np
    if args.target:
        target = jnp.asarray(np.load(args.target), jnp.float32)
    else:
        # self-calibration demo: target = true scene; start from perturbed
        target = golden.render_frame(scene, mats, cfg, 0)
        rng = np.random.default_rng(0)
        m = scene.materials
        scene = dataclasses.replace(scene, materials=dataclasses.replace(
            m,
            albedo=jnp.clip(m.albedo + jnp.asarray(
                rng.normal(0, 0.2, m.albedo.shape), jnp.float32), 0, 1),
            emission_strength=m.emission_strength * 0.3))

    log = MetricsLogger(args.metrics)
    inv = InverseRenderConfig(trainable=tuple(args.trainable.split(",")),
                              learning_rate=args.lr, steps=args.steps,
                              log_every=args.log_every)
    mesh = pmesh.make_mesh()
    # pass the Camera (not prebuilt matrices) so camera_* trainables work
    scene, cam, history = run_inverse_rendering(
        scene, cam, target, cfg, inv, mesh=mesh,
        log_fn=lambda rec: log.log("opt_step", **rec),
        checkpoint_dir=args.checkpoint_dir,
        checkpoint_every=args.checkpoint_every,
        resume=args.resume)
    print(f"final loss {history[-1]['loss']:.6g}", file=sys.stderr)

    if args.out_dir:
        from wc_path_tracer_tpu.utils.checkpoint import save_pytree
        save_pytree(args.out_dir, {"scene": scene, "camera": cam})
        print(f"optimized scene -> {args.out_dir}", file=sys.stderr)
    return history


def cmd_info(args):
    import jax
    print(f"backend: {jax.default_backend()}")
    print(f"devices: {jax.devices()}")
    print(f"process: {jax.process_index()}/{jax.process_count()}")


def main(argv=None):
    ap = argparse.ArgumentParser(prog="wc_path_tracer_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("render", help="progressive render to PNG")
    _add_render_args(pr)
    pr.add_argument("--frames", type=int, default=8)
    pr.add_argument("--out", default="render.png")
    pr.add_argument("--tonemap", default=None)
    pr.add_argument("--gamma", type=float, default=None)
    pr.add_argument("--debug-bvh", metavar="PNG",
                    help="also write the frame with BVH node AABB wireframes "
                         "overlaid (the reference's disabled box renderer, "
                         "src/editor.jai:159-171 — live here)")
    pr.add_argument("--checkpoint", help="save renderer state to this dir")
    pr.add_argument("--resume", help="resume renderer state from this dir")
    pr.add_argument("--metrics", help="JSONL metrics path")
    pr.set_defaults(fn=cmd_render)

    pi = sub.add_parser("invert", help="inverse rendering")
    _add_render_args(pi)
    pi.add_argument("--steps", type=int, default=100)
    pi.add_argument("--lr", type=float, default=5e-2)
    pi.add_argument("--trainable", default="albedo,emission_strength")
    pi.add_argument("--target", help=".npy target image (else self-demo)")
    pi.add_argument("--out-dir", help="save optimized scene pytree here")
    pi.add_argument("--metrics", help="JSONL metrics path")
    pi.add_argument("--log-every", type=int, default=10)
    pi.add_argument("--checkpoint-dir",
                    help="persist (params, opt_state, step) here")
    pi.add_argument("--checkpoint-every", type=int, default=0,
                    help="checkpoint period in steps (0 = final only)")
    pi.add_argument("--resume", action="store_true",
                    help="resume an interrupted run from --checkpoint-dir")
    pi.set_defaults(fn=cmd_invert)

    pn = sub.add_parser("info", help="device/mesh info")
    pn.set_defaults(fn=cmd_info)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    main()

"""Render-path dispatch: choose the closest-hit backend per workload.

Backends (all share golden.py's transport; only the closest-hit query
differs):

- ``golden``    — masked brute-force sweep over every primitive.  On TPU's
  SIMD vector units a dense intersect-all sweep beats divergent per-lane
  traversal until the triangle count crosses a few hundred.
- ``wavefront`` — XLA per-lane BVH walk (stack or stackless escape-link);
  scales to arbitrary scene sizes, handles incoherent bounce wavefronts.
- ``sweep``     — block-sparse cluster sweep (kernels/cluster.py): XLA
  ray-vs-cluster-AABB cull + a Pallas kernel sweeping only the surviving
  (ray-block, cluster) pairs on the VPU.  The production path for meshed
  scenes (round-3 honest measurements, BASELINE.md).
- ``pallas``    — Pallas packet-BVH kernel (kernels/traversal.py): one
  shared SMEM stack per 1024-ray packet, scalar node loads broadcast to all
  lanes.  Kept as the pointer-chasing design point; loses to ``sweep``.
- ``auto``      — picks by scene size: brute force below
  BRUTE_FORCE_MAX_TRIS triangles, the cluster sweep above.

Crossover provenance: round-3 honest timings (BASELINE.md round-3 table) —
the brute sweep and the cluster sweep coincide below a few hundred
triangles (the cull stage then only adds overhead), and the cluster sweep
wins above by block-level culling.
"""

from __future__ import annotations

BRUTE_FORCE_MAX_TRIS = 256
PALLAS_MAX_TRIS = 8192  # ~1MB SMEM budget for the packet kernel's tables


def get_render_frame(name: str, scene, cfg):
    from wc_path_tracer_tpu.render import golden

    if name == "golden":
        return golden.render_frame
    if name == "sweep":
        from wc_path_tracer_tpu.render import sweep
        return sweep.render_frame
    if name in ("wavefront", "pallas"):
        try:
            from wc_path_tracer_tpu.render import wavefront
        except ImportError as e:
            raise NotImplementedError(
                f"the {name} BVH renderer is not available in this build; "
                "use --renderer golden") from e
        if name == "pallas":
            # chunk slicing is static per bank layout: compute it here from
            # the concrete scene (raises if a single draw exceeds the SMEM
            # budget — rebuild with add_mesh(max_blas_tris=...))
            from wc_path_tracer_tpu.kernels.traversal import smem_chunks
            chunks = smem_chunks(scene.mesh, PALLAS_MAX_TRIS)

            def render_frame_pallas(scene, mats, cfg, frame_count):
                intersect_fn = lambda s, o, d, c: \
                    wavefront.intersect_scene_pallas(s, o, d, c, chunks=chunks)
                from wc_path_tracer_tpu.render import golden
                return golden.render_frame(scene, mats, cfg, frame_count,
                                           intersect_fn=intersect_fn)
            return render_frame_pallas
        return wavefront.render_frame
    # auto
    n_tris = int(scene.mesh.indices.shape[0]) // 3
    if n_tris > BRUTE_FORCE_MAX_TRIS:
        try:
            from wc_path_tracer_tpu.render import sweep
            return sweep.render_frame
        except ImportError:
            pass
    return golden.render_frame

"""Render-path dispatch: choose golden (brute force) vs wavefront (BVH).

"auto" picks brute force for small scenes — on TPU's SIMD vector units, a
dense masked intersect-all-primitives sweep beats divergent per-lane BVH
traversal until the triangle count crosses a few hundred — and the wavefront
BVH path beyond that.
"""

from __future__ import annotations

BRUTE_FORCE_MAX_TRIS = 256


def get_render_frame(name: str, scene, cfg):
    from wc_path_tracer_tpu.render import golden

    if name == "golden":
        return golden.render_frame
    if name == "wavefront":
        try:
            from wc_path_tracer_tpu.render import wavefront
        except ImportError as e:
            raise NotImplementedError(
                "the wavefront BVH renderer is not available in this build; "
                "use --renderer golden") from e
        return wavefront.render_frame
    # auto
    n_tris = int(scene.mesh.indices.shape[0]) // 3
    if n_tris > BRUTE_FORCE_MAX_TRIS:
        try:
            from wc_path_tracer_tpu.render import wavefront
            return wavefront.render_frame
        except ImportError:
            pass
    return golden.render_frame

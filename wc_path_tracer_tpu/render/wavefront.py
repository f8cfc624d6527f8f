"""BVH-traversal renderer: the scalable path for triangle-heavy scenes.

The reference's hottest code is a per-thread iterative BVH stack walk inside
the megakernel (Intersect, pathTracer.comp:151-201).  On TPU there are no
per-thread stacks or divergent threads — a "thread" is a vector lane — so the
walk is re-designed as a *vectorized masked traversal*:

- every ray carries its own (32-deep) stack as a row of a (R, 32) array,
  manipulated with one-hot masks (pure VPU ops, no scatters)
- one ``lax.while_loop`` iteration pops one node per active lane; lanes
  that run out of work idle (mask off) until all lanes drain
- near-child-first ordering is preserved per lane exactly as the reference
  orders pushes (pathTracer.comp:186-198)
- leaf triangle tests are statically unrolled ``max_leaf_tris`` times (the
  robust BVH builder bounds leaves at 2 triangles; scene/bvh.py)

Differentiability: the traversal itself is discrete argmin search and runs
under ``stop_gradient`` in integer space (``lax.while_loop`` has no reverse
rule and needs none here).  The winning primitive index is then *re-shaded
differentiably*: t/point/normal are recomputed from the gathered primitive
data, so gradients w.r.t. vertices/sphere params flow exactly as in the
brute-force golden renderer (same detached-argmin estimator).

Shading/transport is shared with render/golden.py (trace_rays intersect_fn
injection) — this module only swaps the closest-hit query.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from wc_path_tracer_tpu.ops import intersect as ix
from wc_path_tracer_tpu.render import golden
from wc_path_tracer_tpu.scene.types import Scene
from wc_path_tracer_tpu.utils.config import RenderConfig

import numpy as np

F32 = np.float32  # np scalar ctors: jnp ones create device consts when traced
I32 = np.int32
KINF = ix.KINFINITY
STACK_DEPTH = 32  # reference: uint nodeStack[32] (pathTracer.comp:151)


def _bvh_closest_tri(scene: Scene, origin, direction, t_init):
    """Vectorized BVH walk over all draw commands.

    Returns (t_best, best_index_offset) where best_index_offset is the
    global offset into mesh.indices of the winning triangle's first index
    (-1 if none beat t_init).  Runs entirely on stop_gradient'ed values.
    """
    mesh = scene.mesh
    origin = jax.lax.stop_gradient(origin)
    direction = jax.lax.stop_gradient(direction)
    t_init = jax.lax.stop_gradient(t_init)
    inv_dir = F32(1.0) / direction
    R = origin.shape[0]

    node_min = jax.lax.stop_gradient(mesh.bvh_min)
    node_max = jax.lax.stop_gradient(mesh.bvh_max)
    verts = jax.lax.stop_gradient(mesh.vertices)

    lanes_sublane = jnp.arange(STACK_DEPTH, dtype=I32)[None, :]  # (1, 32)

    def traverse_one_draw(d_idx, carry):
        t_best, best_off = carry
        active_draw = d_idx < mesh.draw_count
        node_off = mesh.draw_node_offset[d_idx]
        index_off = mesh.draw_index_offset[d_idx]
        vert_off = mesh.draw_vertex_offset[d_idx]

        # stack init: root node (node_off) pushed for every lane
        stack = jnp.zeros((R, STACK_DEPTH), I32)
        stack = jnp.where(lanes_sublane == 0, node_off, stack)
        ptr = jnp.where(active_draw, jnp.ones((R,), I32), jnp.zeros((R,), I32))

        def cond(state):
            _, _, _, ptr = state
            return jnp.any(ptr > 0)

        def body(state):
            t_best, best_off, stack, ptr = state
            active = ptr > 0
            # pop: one-hot gather at ptr-1
            top = jnp.clip(ptr - 1, 0, STACK_DEPTH - 1)
            onehot_top = lanes_sublane == top[:, None]          # (R, 32)
            node = jnp.sum(jnp.where(onehot_top, stack, 0), axis=1)
            ptr = jnp.where(active, ptr - 1, ptr)

            nmin = node_min[node]
            nmax = node_max[node]
            t0, t1 = ix.ray_box(origin, inv_dir, nmin, nmax)
            # proceed iff t0<=t1 && t1>=0 && t0<=t_best (pathTracer.comp:162)
            enter = active & (t0 <= t1) & (t1 >= F32(0.0)) & (t0 <= t_best)

            count = mesh.bvh_count[node]
            left = mesh.bvh_left[node]
            is_leaf = count > 0

            # --- leaf: statically-unrolled triangle tests ---
            for k in range(mesh.max_leaf_tris):
                tri_valid = enter & is_leaf & (I32(3 * k) < count)
                i0 = index_off + left + I32(3 * k)
                ia = vert_off + mesh.indices[i0]
                ib = vert_off + mesh.indices[i0 + 1]
                ic = vert_off + mesh.indices[i0 + 2]
                t, _, _, hit = ix.ray_triangle(
                    origin, direction, verts[ia], verts[ib], verts[ic])
                upd = tri_valid & hit & (t < t_best)
                t_best = jnp.where(upd, t, t_best)
                best_off = jnp.where(upd, i0, best_off)

            # --- inner: push children, near child popped first ---
            push = enter & ~is_leaf
            lchild = node_off + left
            rchild = lchild + 1
            lt0, lt1 = ix.ray_box(origin, inv_dir, node_min[lchild], node_max[lchild])
            rt0, rt1 = ix.ray_box(origin, inv_dir, node_min[rchild], node_max[rchild])
            # reference distance heuristic (pathTracer.comp:189-190)
            ldist = jnp.where(lt0 > F32(0.0), lt0, lt1)
            rdist = jnp.where(rt0 > F32(0.0), rt0, rt1)
            near_is_left = ldist < rdist
            first = jnp.where(near_is_left, rchild, lchild)   # pushed first
            second = jnp.where(near_is_left, lchild, rchild)  # popped first

            slot1 = lanes_sublane == ptr[:, None]
            stack = jnp.where(slot1 & push[:, None], first[:, None], stack)
            ptr = jnp.where(push, ptr + 1, ptr)
            slot2 = lanes_sublane == ptr[:, None]
            stack = jnp.where(slot2 & push[:, None], second[:, None], stack)
            ptr = jnp.where(push, ptr + 1, ptr)

            return t_best, best_off, stack, ptr

        t_best, best_off, _, _ = jax.lax.while_loop(
            cond, body, (t_best, best_off, stack, ptr))
        return t_best, best_off

    best = (t_init, jnp.full((R,), -1, I32))
    # draw commands loop (pathTracer.comp:152); capacity is static, liveness
    # masked inside
    t_best, best_off = jax.lax.fori_loop(
        0, mesh.draw_capacity, traverse_one_draw, best)
    return t_best, best_off


def _bvh_closest_tri_stackless(scene: Scene, origin, direction, t_init):
    """Stackless escape-link BVH walk (TPU-preferred traversal).

    Same closest-hit result as _bvh_closest_tri, different machine mapping:
    per-lane state is ONE i32 node cursor instead of an (R, 32) stack, so
    each while iteration is a handful of gathers + one box test on the VPU —
    no one-hot stack updates and no two extra child box tests.  Visit order
    is fixed DFS (no near-child-first heuristic, pathTracer.comp:186-198);
    t-max pruning still culls whole subtrees, and the fixed order is the
    price of the ~5x cheaper iteration.  Escape links come from the host
    builder (scene/types.py escape_links)."""
    mesh = scene.mesh
    origin = jax.lax.stop_gradient(origin)
    direction = jax.lax.stop_gradient(direction)
    t_init = jax.lax.stop_gradient(t_init)
    inv_dir = F32(1.0) / direction
    R = origin.shape[0]

    node_min = jax.lax.stop_gradient(mesh.bvh_min)
    node_max = jax.lax.stop_gradient(mesh.bvh_max)
    verts = jax.lax.stop_gradient(mesh.vertices)

    def traverse_one_draw(d_idx, carry):
        t_best, best_off = carry
        active_draw = d_idx < mesh.draw_count
        node_off = mesh.draw_node_offset[d_idx]
        index_off = mesh.draw_index_offset[d_idx]
        vert_off = mesh.draw_vertex_offset[d_idx]

        cur = jnp.where(active_draw, jnp.full((R,), 1, I32) * node_off,
                        jnp.full((R,), -1, I32))

        def cond(state):
            _, _, cur = state
            return jnp.any(cur >= 0)

        def body(state):
            t_best, best_off, cur = state
            active = cur >= 0
            node = jnp.maximum(cur, 0)

            t0, t1 = ix.ray_box(origin, inv_dir, node_min[node], node_max[node])
            enter = active & (t0 <= t1) & (t1 >= F32(0.0)) & (t0 <= t_best)

            count = mesh.bvh_count[node]
            left = mesh.bvh_left[node]
            esc = mesh.bvh_escape[node]
            is_leaf = count > 0

            for k in range(mesh.max_leaf_tris):
                tri_valid = enter & is_leaf & (I32(3 * k) < count)
                i0 = index_off + left + I32(3 * k)
                ia = vert_off + mesh.indices[i0]
                ib = vert_off + mesh.indices[i0 + 1]
                ic = vert_off + mesh.indices[i0 + 2]
                t, _, _, hit = ix.ray_triangle(
                    origin, direction, verts[ia], verts[ib], verts[ic])
                upd = tri_valid & hit & (t < t_best)
                t_best = jnp.where(upd, t, t_best)
                best_off = jnp.where(upd, i0, best_off)

            esc_g = jnp.where(esc < 0, I32(-1), node_off + esc)
            nxt = jnp.where(enter & ~is_leaf, node_off + left, esc_g)
            cur = jnp.where(active, nxt, cur)
            return t_best, best_off, cur

        t_best, best_off, _ = jax.lax.while_loop(
            cond, body, (t_best, best_off, cur))
        return t_best, best_off

    best = (t_init, jnp.full((R,), -1, I32))
    return jax.lax.fori_loop(0, mesh.draw_capacity, traverse_one_draw, best)


def intersect_scene_bvh(scene: Scene, origin, direction, cfg: RenderConfig):
    """Closest-hit query via BVH traversal; same selection semantics as
    golden.intersect_scene_brute (spheres first, triangles override on
    strictly-closer, quirks preserved)."""
    sph = scene.spheres

    # --- spheres: brute force (counts are tiny; same as reference's linear
    # scan, pathTracer.comp:140-149) ---
    near, far = ix.ray_sphere(origin[:, None, :], direction[:, None, :],
                              sph.position[None], sph.radius[None])
    s_live = (jnp.arange(sph.capacity, dtype=I32) < sph.count)[None, :]
    if cfg.sphere_near_root_only:
        t_cand = near
    else:
        t_cand = jnp.where(near > F32(0.0), near, far)
    t_sph = jnp.where(s_live & (t_cand > F32(0.0)), t_cand, KINF)
    sph_idx = jnp.argmin(t_sph, axis=-1)
    t_s = jnp.take_along_axis(t_sph, sph_idx[:, None], axis=-1)[:, 0]

    # --- triangles: discrete BVH search, then differentiable re-shade ---
    walk = (_bvh_closest_tri_stackless if cfg.traversal == "stackless"
            else _bvh_closest_tri)
    _, best_off = walk(scene, origin, direction, t_s)
    return _reshade(scene, origin, direction, cfg, t_s, sph_idx, best_off)


def intersect_scene_pallas(scene: Scene, origin, direction, cfg: RenderConfig,
                           interpret: bool | None = None, chunks=None):
    """Closest-hit via the Pallas packet-BVH kernel (kernels/traversal.py).

    Production backend for *coherent* ray batches (primary rays, shadow rays)
    whose scene tables fit the SMEM budget (~8k triangles per call).
    Arbitrary ray counts are handled by replicating ray 0 up to the next
    multiple of the 1024-lane packet size (replicated rays traverse the same
    nodes the packet already visits, so padding costs ~nothing).  Banks past
    the SMEM budget run chunked: ``chunks`` (from kernels.traversal
    smem_chunks, computed host-side at dispatch time) selects static table
    slices processed sequentially with the closest-t carried across calls.
    Same selection semantics and differentiable re-shade as
    intersect_scene_bvh.
    """
    from wc_path_tracer_tpu.kernels.traversal import (
        PACKET_SIZE, packet_bvh_intersect, packet_bvh_intersect_chunked)

    if interpret is None:
        # Mosaic compiles only for TPU; on the CPU backend (tests, local
        # dev) fall back to the Pallas interpreter automatically.
        interpret = jax.default_backend() != "tpu"

    sph = scene.spheres
    mesh = scene.mesh

    near, far = ix.ray_sphere(origin[:, None, :], direction[:, None, :],
                              sph.position[None], sph.radius[None])
    s_live = (jnp.arange(sph.capacity, dtype=I32) < sph.count)[None, :]
    if cfg.sphere_near_root_only:
        t_cand = near
    else:
        t_cand = jnp.where(near > F32(0.0), near, far)
    t_sph = jnp.where(s_live & (t_cand > F32(0.0)), t_cand, KINF)
    sph_idx = jnp.argmin(t_sph, axis=-1)
    t_s = jnp.take_along_axis(t_sph, sph_idx[:, None], axis=-1)[:, 0]

    m = dict(vertices=mesh.vertices, bvh_min=mesh.bvh_min,
             bvh_max=mesh.bvh_max, bvh_left=mesh.bvh_left,
             bvh_count=mesh.bvh_count, indices=mesh.indices,
             draw_node_offset=mesh.draw_node_offset,
             draw_index_offset=mesh.draw_index_offset,
             draw_vertex_offset=mesh.draw_vertex_offset,
             draw_count=mesh.draw_count)
    sg = jax.lax.stop_gradient
    R = origin.shape[0]
    pad = (-R) % PACKET_SIZE
    o_k, d_k, t_k = sg(origin), sg(direction), sg(t_s)
    if pad:
        o_k = jnp.concatenate([o_k, jnp.broadcast_to(o_k[:1], (pad, 3))])
        d_k = jnp.concatenate([d_k, jnp.broadcast_to(d_k[:1], (pad, 3))])
        t_k = jnp.concatenate([t_k, jnp.broadcast_to(t_k[:1], (pad,))])
    if chunks is not None:
        _, best_off = packet_bvh_intersect_chunked(
            o_k, d_k, t_k, m, chunks,
            max_leaf_tris=mesh.max_leaf_tris, interpret=interpret)
    else:
        _, best_off = packet_bvh_intersect(
            o_k, d_k, t_k, m,
            max_leaf_tris=mesh.max_leaf_tris, interpret=interpret)
    best_off = best_off[:R]
    return _reshade(scene, origin, direction, cfg, t_s, sph_idx, best_off)


def _reshade(scene, origin, direction, cfg, t_s, sph_idx, best_off):
    """Differentiable re-shade shared by the XLA and Pallas search backends."""
    mesh = scene.mesh
    sph = scene.spheres
    tri_hit = best_off >= 0
    safe_off = jnp.maximum(best_off, 0)
    ia = mesh.indices[safe_off]
    ib = mesh.indices[safe_off + 1]
    ic = mesh.indices[safe_off + 2]
    # O(1) vertex-offset recovery via the per-triangle draw-id column
    # (scene/types.py tri_draw) instead of rescanning the draw table per ray
    draw_id = jnp.maximum(mesh.tri_draw[safe_off // 3], 0)
    vert_off = mesh.draw_vertex_offset[draw_id]
    a = mesh.vertices[vert_off + ia]
    b = mesh.vertices[vert_off + ib]
    c = mesh.vertices[vert_off + ic]
    t_tri = ix.ray_triangle_reshade(origin, direction, a, b, c)
    t_tr = jnp.where(tri_hit, t_tri, KINF)

    use_tri = t_tr < t_s
    t_best = jnp.where(use_tri, t_tr, t_s)
    hit = t_best < KINF
    t_safe = jnp.where(hit, t_best, F32(1.0))
    p = origin + t_safe[:, None] * direction

    sph_center = sph.position[sph_idx]
    sph_radius = sph.radius[sph_idx]
    safe_radius = jnp.where(sph_radius > F32(0.0), sph_radius, F32(1.0))
    n_sph = (p - sph_center) / safe_radius[:, None]
    n_tri = ix.normalize(jnp.cross(b - a, c - a), eps=F32(1e-20))

    normal = jnp.where(use_tri[:, None], n_tri, n_sph)
    material = jnp.where(use_tri, mesh.tri_material[safe_off // 3],
                         sph.material[sph_idx])
    front = jnp.sum(direction * normal, axis=-1) < F32(0.0)
    normal = jnp.where(front[:, None], normal, -normal)
    normal = jnp.where(hit[:, None], normal, jnp.array([0.0, 0.0, 1.0], F32))
    return golden.HitRecord(t=t_safe, p=p, normal=normal, hit=hit,
                            front=front, material=material.astype(I32))


def trace_rays(scene, origin, direction, seed, cfg):
    return golden.trace_rays(scene, origin, direction, seed, cfg,
                             intersect_fn=intersect_scene_bvh)


def render_rows(scene, mats, cfg, frame_count, y0, num_rows):
    return golden.render_rows(scene, mats, cfg, frame_count, y0, num_rows,
                              intersect_fn=intersect_scene_bvh)


def render_frame(scene, mats, cfg, frame_count):
    return golden.render_frame(scene, mats, cfg, frame_count,
                               intersect_fn=intersect_scene_bvh)


def _pallas_intersect_fn(scene):
    """intersect_fn specialized to this bank's layout: banks past the SMEM
    budget get host-computed static chunk slices (kernels.traversal)."""
    from wc_path_tracer_tpu.kernels.traversal import smem_chunks
    from wc_path_tracer_tpu.render.dispatch import PALLAS_MAX_TRIS
    chunks = smem_chunks(scene.mesh, PALLAS_MAX_TRIS)

    def fn(scene, origin, direction, cfg):
        return intersect_scene_pallas(scene, origin, direction, cfg,
                                      chunks=chunks)
    return fn


def render_rows_pallas(scene, mats, cfg, frame_count, y0, num_rows):
    return golden.render_rows(scene, mats, cfg, frame_count, y0, num_rows,
                              intersect_fn=_pallas_intersect_fn(scene))


def render_frame_pallas(scene, mats, cfg, frame_count):
    """Full-frame render with the Pallas packet-BVH kernel as the closest-hit
    backend (the load-bearing Pallas path; dispatch name "pallas").

    NOTE: chunk slicing is derived from the *concrete* scene's bank layout at
    call time (outside jit this reads offsets to host once); when jitting,
    build the fn once per bank layout via functools.partial or jit the caller.
    """
    return golden.render_frame(scene, mats, cfg, frame_count,
                               intersect_fn=_pallas_intersect_fn(scene))

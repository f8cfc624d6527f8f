"""Pallas packet-BVH traversal kernel.

This is the Pallas (Mosaic) replacement for the reference's hottest code —
the per-thread BVH stack walk inside the Vulkan megakernel (Intersect,
src/shaders/pathTracer.comp:151-201) — re-designed for how a TPU actually
executes:

**Packet traversal.** A GPU gives every thread its own stack and lets them
diverge; a TPU VPU is an (8, 128) SIMD array with *no* per-lane gathers or
stacks.  So instead of one stack per ray, one *packet* of 1024 rays shares a
single scalar stack in SMEM.  The packet walks the tree once:

- node AABB data is loaded with *scalar* dynamic indices (SMEM-driven row
  reads from VMEM) and broadcast to all 1024 lanes — zero gathers
- the packet descends into a child iff ANY live ray enters it
  (an ``8x128 -> scalar`` reduction), with near-child-first ordering chosen
  by the packet-average entry distance
- leaf triangles (<= max_leaf_tris, bounded by the robust BVH builder) are
  tested by all lanes simultaneously (vectorized Möller-Trumbore)
- per-ray closest-t pruning masks lanes off as they finish

Coherent packets (primary rays from a pixel tile, NEE shadow rays toward a
small light) visit near-minimal node sets; incoherent bounce packets visit
the union.  **Measured on TPU v5e (BASELINE.md round-3 table): 2.3x slower
than the cluster sweep (kernels/cluster.py) on the bunny scene** — the
shared SMEM stack makes incoherent packets visit the union of their node
sets, so dispatch "auto" never selects it; this kernel is the opt-in
`--renderer pallas` design point, kept in case Mosaic grows cross-register
gathers.
A per-lane walk inside Pallas would need per-lane gathers from node tables,
which this Mosaic version cannot express (tpu.dynamic_gather is
single-register: 128-lane tables only).

The kernel's scene tables ride scalar prefetch (SMEM).  Banks larger than
the SMEM budget run CHUNKED (packet_bvh_intersect_chunked): the host splits
big meshes into spatial sub-BLAS draws (scene/bvh.py split_mesh,
SceneBuilder.add_mesh(max_blas_tris=...)), smem_chunks groups draws into
static table slices, and the kernel runs once per chunk with the per-ray
closest t carried across calls for cross-chunk pruning.

Entirely a forward/discrete search — gradients flow through the
differentiable re-shade in wavefront.intersect_scene_* (detached argmin),
so no custom VJP is required for the traversal itself.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = np.float32
I32 = np.int32
KINF = np.float32(3.402823466e38)

PACKET_ROWS = 8          # sublanes
LANES = 128              # lanes; packet = 8*128 = 1024 rays
PACKET_SIZE = PACKET_ROWS * LANES
STACK_DEPTH = 64         # >= tree depth cap (32) + slack


def _tri_test(ox, oy, oz, dx, dy, dz, ax, ay, az, bx, by, bz, cx, cy, cz):
    """Vectorized Möller-Trumbore against one scalar triangle.

    Same math as ops/intersect.ray_triangle (pathTracer.comp:121-133) with
    the triangle broadcast from scalars. Returns (t, hit_mask).
    """
    e1x, e1y, e1z = bx - ax, by - ay, bz - az
    e2x, e2y, e2z = cx - ax, cy - ay, cz - az
    # pvec = d x e2
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = F32(1.0) / det
    ox_, oy_, oz_ = ox - ax, oy - ay, oz - az
    u = (ox_ * px + oy_ * py + oz_ * pz) * inv_det
    # qvec = oa x e1
    qx = oy_ * e1z - oz_ * e1y
    qy = oz_ * e1x - ox_ * e1z
    qz = ox_ * e1y - oy_ * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    hit = (t > F32(0.0)) & (u >= F32(0.0)) & (u <= F32(1.0)) \
        & (v >= F32(0.0)) & (u + v <= F32(1.0))
    return t, hit


def _box_t(ox, oy, oz, ix, iy, iz, mnx, mny, mnz, mxx, mxy, mxz):
    """Vectorized slab test vs a scalar AABB (pathTracer.comp:97-108)."""
    tx0 = (mnx - ox) * ix
    tx1 = (mxx - ox) * ix
    ty0 = (mny - oy) * iy
    ty1 = (mxy - oy) * iy
    tz0 = (mnz - oz) * iz
    tz1 = (mxz - oz) * iz
    tmin = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                       jnp.minimum(tz0, tz1))
    tmax = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                       jnp.maximum(tz0, tz1))
    return tmin, tmax


def _traversal_kernel(max_leaf_tris: int,
                      # scalar-prefetch scene tables (SMEM — the only memory
                      # space supporting arbitrary dynamic scalar indexing)
                      draw_node_off, draw_index_off, draw_vert_off,
                      draw_count_ref,
                      nmnx, nmny, nmnz, nmxx, nmxy, nmxz,
                      node_left, node_count,
                      indices, vx, vy, vz,
                      # vector inputs (blocked per packet)
                      ox, oy, oz, dx, dy, dz, t_in,
                      # outputs
                      t_out, off_out,
                      # scratch
                      stack):
    o_x, o_y, o_z = ox[...], oy[...], oz[...]
    d_x, d_y, d_z = dx[...], dy[...], dz[...]
    inv_x = F32(1.0) / d_x
    inv_y = F32(1.0) / d_y
    inv_z = F32(1.0) / d_z

    t_out[...] = t_in[...]
    off_out[...] = jnp.full_like(off_out[...], -1)

    n_draws = draw_count_ref[0]

    def one_draw(di, _):
        node_off = draw_node_off[di]
        index_off = draw_index_off[di]
        vert_off = draw_vert_off[di]

        stack[0] = node_off  # push root

        def cond(ptr):
            return ptr > 0

        def body(ptr):
            node = stack[ptr - 1]
            ptr = ptr - 1

            t0, t1 = _box_t(o_x, o_y, o_z, inv_x, inv_y, inv_z,
                            nmnx[node], nmny[node], nmnz[node],
                            nmxx[node], nmxy[node], nmxz[node])
            t_best = t_out[...]
            enter = (t0 <= t1) & (t1 >= F32(0.0)) & (t0 <= t_best)
            any_enter = jnp.any(enter)

            count = node_count[node]
            left = node_left[node]
            is_leaf = count > 0

            # --- leaf: test up to max_leaf_tris triangles ---
            def do_leaf():
                for k in range(max_leaf_tris):
                    @pl.when(I32(3 * k) < count)
                    def _():
                        i0 = index_off + left + I32(3 * k)
                        ia = vert_off + indices[i0]
                        ib = vert_off + indices[i0 + 1]
                        ic = vert_off + indices[i0 + 2]
                        t, hit = _tri_test(
                            o_x, o_y, o_z, d_x, d_y, d_z,
                            vx[ia], vy[ia], vz[ia],
                            vx[ib], vy[ib], vz[ib],
                            vx[ic], vy[ic], vz[ic])
                        tb = t_out[...]
                        upd = hit & (t < tb)
                        t_out[...] = jnp.where(upd, t, tb)
                        off_out[...] = jnp.where(upd, i0, off_out[...])

            # --- inner: push children, nearer (packet-average) popped first ---
            def do_inner(ptr):
                lchild = node_off + left
                rchild = lchild + 1
                lt0, lt1 = _box_t(o_x, o_y, o_z, inv_x, inv_y, inv_z,
                                  nmnx[lchild], nmny[lchild], nmnz[lchild],
                                  nmxx[lchild], nmxy[lchild], nmxz[lchild])
                rt0, rt1 = _box_t(o_x, o_y, o_z, inv_x, inv_y, inv_z,
                                  nmnx[rchild], nmny[rchild], nmnz[rchild],
                                  nmxx[rchild], nmxy[rchild], nmxz[rchild])
                # packet-mean of the reference's per-thread distance
                # heuristic (pathTracer.comp:189-190)
                ld = jnp.sum(jnp.where(lt0 > F32(0.0), lt0, lt1))
                rd = jnp.sum(jnp.where(rt0 > F32(0.0), rt0, rt1))
                near_is_left = ld < rd
                first = jnp.where(near_is_left, rchild, lchild)
                second = jnp.where(near_is_left, lchild, rchild)
                stack[ptr] = first
                stack[ptr + 1] = second
                return ptr + 2

            leaf_branch = is_leaf & any_enter
            inner_branch = (~is_leaf) & any_enter

            @pl.when(leaf_branch)
            def _():
                do_leaf()

            ptr = jax.lax.cond(inner_branch, do_inner, lambda p: p, ptr)
            return ptr

        jax.lax.while_loop(cond, body, jnp.int32(1))
        return 0

    jax.lax.fori_loop(0, n_draws, one_draw, 0)


def smem_chunks(mesh, max_tris: int):
    """Host-side: group the bank's draws into contiguous chunks of at most
    ``max_tris`` triangles, so each chunk's tables fit the packet kernel's
    SMEM budget.

    Call OUTSIDE jit with a concrete MeshBank (reads offsets to host).
    Returns a tuple of static-int tuples
    ``(draw_lo, draw_hi, node_lo, node_hi, index_lo, index_hi, vert_lo,
    vert_hi)`` — or None when the whole bank already fits in one call.
    Raises if any single draw exceeds ``max_tris`` (split it at build time
    with SceneBuilder.add_mesh(max_blas_tris=...)).
    """
    nd = int(mesh.draw_count)
    total_tris = int(mesh.indices.shape[0]) // 3
    if total_tris <= max_tris:
        return None
    dio = np.asarray(mesh.draw_index_offset)[:nd]
    dic = np.asarray(mesh.draw_index_count)[:nd]
    dno = np.asarray(mesh.draw_node_offset)[:nd]
    dvo = np.asarray(mesh.draw_vertex_offset)[:nd]
    # per-draw extents end where the next draw begins; the last draw's
    # extent runs to capacity (trailing padding is inert: padded nodes carry
    # inverted-empty boxes and are never referenced by any tree)
    node_end = np.append(dno[1:], mesh.bvh_min.shape[0])
    vert_end = np.append(dvo[1:], mesh.vertices.shape[0])
    index_end = dio + dic

    chunks = []
    d = 0
    while d < nd:
        tris = 0
        d0 = d
        while d < nd and tris + int(dic[d]) // 3 <= max_tris:
            tris += int(dic[d]) // 3
            d += 1
        if d == d0:
            raise ValueError(
                f"draw {d} has {int(dic[d]) // 3} triangles > the packet "
                f"kernel budget of {max_tris}; rebuild the scene with "
                f"SceneBuilder.add_mesh(max_blas_tris={max_tris})")
        last = d - 1
        chunks.append((d0, d, int(dno[d0]), int(node_end[last]),
                       int(dio[d0]), int(index_end[last]),
                       int(dvo[d0]), int(vert_end[last])))
    return tuple(chunks)


def packet_bvh_intersect_chunked(origin, direction, t_init, mesh_arrays,
                                 chunks, max_leaf_tris: int = 2,
                                 interpret: bool = False):
    """Closest hit over a bank too large for one SMEM-resident call.

    Runs the packet kernel once per chunk (static table slices, offsets
    rebased to chunk-local), carrying the per-ray closest t forward so later
    chunks prune against hits from earlier ones — the same t-max pruning the
    reference applies across its draw-command loop (pathTracer.comp:152,162).
    """
    m = mesh_arrays
    t_best = t_init
    best_off = jnp.full(origin.shape[0], -1, jnp.int32)
    for (dlo, dhi, nlo, nhi, ilo, ihi, vlo, vhi) in chunks:
        sub = dict(
            vertices=m["vertices"][vlo:vhi],
            bvh_min=m["bvh_min"][nlo:nhi], bvh_max=m["bvh_max"][nlo:nhi],
            bvh_left=m["bvh_left"][nlo:nhi], bvh_count=m["bvh_count"][nlo:nhi],
            indices=m["indices"][ilo:ihi],
            draw_node_offset=m["draw_node_offset"][dlo:dhi] - nlo,
            draw_index_offset=m["draw_index_offset"][dlo:dhi] - ilo,
            draw_vertex_offset=m["draw_vertex_offset"][dlo:dhi] - vlo,
            draw_count=jnp.clip(m["draw_count"] - dlo, 0, dhi - dlo),
        )
        tc, oc = packet_bvh_intersect(origin, direction, t_best, sub,
                                      max_leaf_tris=max_leaf_tris,
                                      interpret=interpret)
        upd = oc >= 0  # kernel reports only hits beating the carried t
        t_best = jnp.where(upd, tc, t_best)
        best_off = jnp.where(upd, oc + I32(ilo), best_off)
    return t_best, best_off


@functools.partial(jax.jit, static_argnames=("max_leaf_tris", "interpret"))
def packet_bvh_intersect(origin, direction, t_init, mesh_arrays,
                         max_leaf_tris: int = 2, interpret: bool = False):
    """Closest triangle hit for every ray via the Pallas packet kernel.

    origin/direction: (R, 3) with R a multiple of 1024; t_init: (R,) initial
    closest-t (e.g. from the sphere pass).  mesh_arrays: dict with
    bvh_min/bvh_max/bvh_left/bvh_count/indices/vertices + draw tables
    (see scene.types.MeshBank).
    Returns (t (R,), index_offset (R,) — -1 where no triangle beat t_init).
    """
    R = origin.shape[0]
    if R % (PACKET_ROWS * LANES):
        raise ValueError(f"ray count {R} must be a multiple of "
                         f"{PACKET_ROWS * LANES}")
    rows = R // LANES
    grid = rows // PACKET_ROWS

    def comp2d(a):  # (R,) -> (rows, LANES)
        return a.reshape(rows, LANES)

    o = [comp2d(origin[:, k]) for k in range(3)]
    d = [comp2d(direction[:, k]) for k in range(3)]
    t0 = comp2d(t_init)

    m = mesh_arrays
    verts = m["vertices"]
    # every scene table is 1-D: SMEM pads 2-D minor dims to 128 lanes, which
    # would blow the ~1MB SMEM budget 43x
    vxyz = [verts[:, k] for k in range(3)]
    nodes_cols = ([m["bvh_min"][:, k] for k in range(3)]
                  + [m["bvh_max"][:, k] for k in range(3)])

    ray_spec = pl.BlockSpec((PACKET_ROWS, LANES), lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=16,   # the entire scene rides in SMEM (1-D tables)
        grid=(grid,),
        in_specs=[ray_spec] * 7,
        out_specs=[ray_spec, ray_spec],
        scratch_shapes=[pltpu.SMEM((STACK_DEPTH,), jnp.int32)],
    )

    kernel = functools.partial(_traversal_kernel, max_leaf_tris)
    t_out, off_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
                   jax.ShapeDtypeStruct((rows, LANES), jnp.int32)],
        interpret=interpret,
    )(m["draw_node_offset"], m["draw_index_offset"], m["draw_vertex_offset"],
      jnp.reshape(m["draw_count"], (1,)),
      *nodes_cols, m["bvh_left"], m["bvh_count"],
      m["indices"], *vxyz,
      *o, *d, t0)
    return t_out.reshape(R), off_out.reshape(R)

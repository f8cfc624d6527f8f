"""Scene data model: SoA pytrees, padded to static shapes.

The reference keeps scene data as AoS structs in GPU buffers addressed by
device pointers (src/PathTracingRenderer.jai:38-140, pathTracer.comp:10-88).
On TPU the idiomatic layout is structure-of-arrays in HBM with *static*
shapes: arrays are padded to fixed capacities and live counts are carried as
int32 scalars inside the pytree, so edits (add/remove a sphere, tweak a
material) never trigger recompilation — the runtime analog of the reference's
resizable DBufferManager (src/BufferManager.jai).

Dynamic counts reach the kernels as masked comparisons against iota, exactly
how the reference passes ``sphereCount``/``drawCommandCount`` as runtime
uniforms (pathTracer.comp:140,152).

Material type ids 0/1 match the reference enum (pathTracer.comp:32-33);
2 (Lambertian) and 3 (rough GGX conductor) are extensions required by the
BASELINE north star (the reference has no diffuse BSDF).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

MATERIAL_METAL = 0        # pathTracer.comp:32
MATERIAL_DIELECTRIC = 1   # pathTracer.comp:33
MATERIAL_LAMBERTIAN = 2   # extension: cosine-weighted diffuse
MATERIAL_GGX = 3          # extension: GGX microfacet conductor

F32 = jnp.float32
I32 = jnp.int32


def _pytree(cls):
    cls = dataclasses.dataclass(cls)
    return jax.tree_util.register_dataclass(cls)


@_pytree
class Materials:
    """SoA mirror of the reference Material struct (pathTracer.comp:35-47).

    ``metallic`` is carried for parity but — like the reference, where it is
    declared and never read (quirk §2.4(4)) — it only affects the extension
    GGX lobe, never the compat METAL/DIELECTRIC paths.
    """

    mtype: jax.Array               # (M,) int32
    albedo: jax.Array              # (M, 3) f32
    emission: jax.Array            # (M, 3) f32
    emission_strength: jax.Array   # (M,) f32
    metallic: jax.Array            # (M,) f32
    roughness: jax.Array           # (M,) f32
    absorption: jax.Array          # (M, 3) f32
    absorption_strength: jax.Array  # (M,) f32
    ior: jax.Array                 # (M,) f32
    count: jax.Array               # () int32 — live materials

    @property
    def capacity(self) -> int:
        return self.mtype.shape[0]

    @staticmethod
    def empty(capacity: int) -> "Materials":
        """Defaults mirror the reference struct defaults
        (src/PathTracingRenderer.jai:58-70): absorptionStrength=1, ior=1,
        everything else zero, type=METAL."""
        z = np.zeros(capacity, np.float32)
        z3 = np.zeros((capacity, 3), np.float32)
        return Materials(
            mtype=jnp.zeros(capacity, I32),
            albedo=jnp.asarray(z3),
            emission=jnp.asarray(z3),
            emission_strength=jnp.asarray(z),
            metallic=jnp.asarray(z),
            roughness=jnp.asarray(z),
            absorption=jnp.asarray(z3),
            absorption_strength=jnp.ones(capacity, F32),
            ior=jnp.ones(capacity, F32),
            count=jnp.asarray(0, I32),
        )


@_pytree
class Spheres:
    """SoA mirror of the reference Sphere struct (pathTracer.comp:60-64)."""

    position: jax.Array  # (S, 3) f32
    radius: jax.Array    # (S,) f32
    material: jax.Array  # (S,) int32
    count: jax.Array     # () int32

    @property
    def capacity(self) -> int:
        return self.radius.shape[0]

    @staticmethod
    def empty(capacity: int) -> "Spheres":
        return Spheres(
            position=jnp.zeros((capacity, 3), F32),
            radius=jnp.zeros(capacity, F32),
            material=jnp.zeros(capacity, I32),
            count=jnp.asarray(0, I32),
        )


@_pytree
class MeshBank:
    """All triangle meshes flattened into one shared bank.

    The reference keeps one vertex/index/BVH buffer trio per model and an
    array of DrawCommands holding device addresses (pathTracer.comp:82-88,
    src/PathTracingRenderer.jai:135-140).  Device pointers do not exist in
    XLA's world; instead each draw command holds *offsets* into the shared
    padded arrays — the same indirection, expressed as indices.

    BVH node layout matches the reference Node (pathTracer.comp:66-72):
    leaf iff ``tri_count > 0``; then ``left_or_first`` is the first *index*
    (not triangle — the reference counts indices with stride 3, quirk in
    SURVEY §2.1) into ``indices``; otherwise children are ``left_or_first``
    and ``left_or_first + 1``.

    ``tri_material`` extends the reference (which hardcodes material 0 for
    every triangle hit, pathTracer.comp:175): builders preserve compat by
    assigning 0, while Cornell/glTF scenes use real per-triangle materials.
    ``normals``/``uvs`` are loaded (the reference's OBJ parser fills them,
    src/ModelLoader.jai:113-127) but, like the reference, the tracer shades
    with flat geometric normals.
    """

    vertices: jax.Array       # (V, 3) f32
    normals: jax.Array        # (V, 3) f32
    uvs: jax.Array            # (V, 2) f32
    indices: jax.Array        # (I,) int32 — triangle list, stride 3
    tri_material: jax.Array   # (I//3,) int32 — per-triangle material id
    tri_draw: jax.Array       # (I//3,) int32 — draw id owning each triangle
    #   slot (-1 = padding / removed draw).  Replaces the reference's
    #   pointer-chasing "which DrawCommand does this index belong to"
    #   (device addresses, pathTracer.comp:82-88) with a precomputed O(1)
    #   column — liveness checks and vertex-offset recovery become single
    #   gathers instead of O(T*D)/O(R*D) draw-table rescans per bounce.
    tri_neighbor: jax.Array   # (I//3, 3) int32 — bank-global neighbor
    #   triangle across edge k (edges: (a,b), (b,c), (c,a)); -1 = boundary
    #   or padding.  Host-built from position-keyed edge adjacency
    #   (triangle_neighbors); consumed by the mesh silhouette-gradient
    #   estimator to classify edges as silhouette (neighbor back-facing /
    #   boundary) vs interior (no coverage smoothing) — the reference has
    #   no gradients at all (SURVEY §2.6), this serves the BASELINE
    #   north-star "vertex positions" gradient set.
    bvh_min: jax.Array        # (N, 3) f32
    bvh_max: jax.Array        # (N, 3) f32
    bvh_left: jax.Array       # (N,) int32 — left child or first index offset
    bvh_count: jax.Array      # (N,) int32 — 0 = inner node, else index count (3*tris)
    bvh_escape: jax.Array     # (N,) int32 — DFS escape link for stackless
    #   traversal (-1 = subtree done -> lane drains); children are allocated
    #   contiguously (left, left+1) so escape(left)=left+1,
    #   escape(right)=escape(parent).  Host-computed; see escape_links().
    draw_vertex_offset: jax.Array  # (D,) int32
    draw_index_offset: jax.Array   # (D,) int32
    draw_node_offset: jax.Array    # (D,) int32
    draw_index_count: jax.Array    # (D,) int32
    draw_count: jax.Array          # () int32
    # static metadata (part of the jit cache key, not a traced leaf): the
    # largest leaf size in any BVH of this bank, so traversal kernels can
    # statically unroll leaf triangle tests.
    max_leaf_tris: int = dataclasses.field(
        metadata=dict(static=True), default=2)

    @property
    def vertex_capacity(self) -> int:
        return self.vertices.shape[0]

    @property
    def index_capacity(self) -> int:
        return self.indices.shape[0]

    @property
    def node_capacity(self) -> int:
        return self.bvh_min.shape[0]

    @property
    def draw_capacity(self) -> int:
        return self.draw_index_count.shape[0]

    @property
    def triangle_capacity(self) -> int:
        return self.indices.shape[0] // 3

    @staticmethod
    def empty(vertex_capacity: int = 8, index_capacity: int = 24,
              node_capacity: int = 8, draw_capacity: int = 1) -> "MeshBank":
        index_capacity = 3 * ((index_capacity + 2) // 3)
        return MeshBank(
            vertices=jnp.zeros((vertex_capacity, 3), F32),
            normals=jnp.zeros((vertex_capacity, 3), F32),
            uvs=jnp.zeros((vertex_capacity, 2), F32),
            indices=jnp.zeros(index_capacity, I32),
            tri_material=jnp.zeros(index_capacity // 3, I32),
            tri_draw=jnp.full(index_capacity // 3, -1, I32),
            tri_neighbor=jnp.full((index_capacity // 3, 3), -1, I32),
            bvh_min=jnp.full((node_capacity, 3), np.float32(np.finfo(np.float32).max)),
            bvh_max=jnp.full((node_capacity, 3), np.float32(-np.finfo(np.float32).max)),
            bvh_left=jnp.zeros(node_capacity, I32),
            bvh_count=jnp.zeros(node_capacity, I32),
            bvh_escape=jnp.full(node_capacity, -1, I32),
            draw_vertex_offset=jnp.zeros(draw_capacity, I32),
            draw_index_offset=jnp.zeros(draw_capacity, I32),
            draw_node_offset=jnp.zeros(draw_capacity, I32),
            draw_index_count=jnp.zeros(draw_capacity, I32),
            draw_count=jnp.asarray(0, I32),
            max_leaf_tris=1,
        )


@_pytree
class Scene:
    """The full scene pytree: replicated across every device in the mesh."""

    materials: Materials
    spheres: Spheres
    mesh: MeshBank

    @staticmethod
    def empty(material_capacity: int = 8, sphere_capacity: int = 8,
              mesh: Optional[MeshBank] = None) -> "Scene":
        return Scene(
            materials=Materials.empty(material_capacity),
            spheres=Spheres.empty(sphere_capacity),
            mesh=mesh if mesh is not None else MeshBank.empty(),
        )


# ---------------------------------------------------------------------------
# Host-side (NumPy) builder — the functional analog of the reference's
# PushMaterial / append(*spheres.data, ...) / SetMetal / SetDielectric
# (src/PathTracingRenderer.jai:72-90, 322-342).
# ---------------------------------------------------------------------------

class SceneBuilder:
    """Accumulates materials/spheres/meshes on host, then pads into a Scene."""

    def __init__(self):
        self.materials: list[dict] = []
        self.spheres: list[tuple] = []
        self.meshes: list[dict] = []

    def add_material(self, mtype=MATERIAL_METAL, albedo=(0, 0, 0),
                     emission=(0, 0, 0), emission_strength=0.0, metallic=0.0,
                     roughness=0.0, absorption=(0, 0, 0),
                     absorption_strength=1.0, ior=1.0) -> int:
        self.materials.append(dict(
            mtype=mtype, albedo=albedo, emission=emission,
            emission_strength=emission_strength, metallic=metallic,
            roughness=roughness, absorption=absorption,
            absorption_strength=absorption_strength, ior=ior))
        return len(self.materials) - 1

    def set_metal(self, albedo, roughness, metallic=0.0) -> int:
        """Reference SetMetal (src/PathTracingRenderer.jai:72-76)."""
        return self.add_material(MATERIAL_METAL, albedo=albedo,
                                 roughness=roughness, metallic=metallic)

    def set_dielectric(self, color, roughness, ior) -> int:
        """Reference SetDielectric — which, faithfully to quirk §2.4(3), does
        NOT set the type field (src/PathTracingRenderer.jai:78-82): the
        material stays METAL.  Use add_material(MATERIAL_DIELECTRIC, ...) for
        an actual dielectric."""
        return self.add_material(MATERIAL_METAL, albedo=color,
                                 roughness=roughness, ior=ior)

    def add_sphere(self, position, radius, material: int) -> int:
        self.spheres.append((position, radius, material))
        return len(self.spheres) - 1

    def add_mesh(self, vertices, indices, normals=None, uvs=None,
                 tri_material=0, bvh=None, robust_bvh=True,
                 max_blas_tris=None) -> int:
        """Add a triangle mesh. ``bvh`` is a scene.bvh.BVH (built if None).

        ``robust_bvh=True`` (default) bounds leaves at 2 triangles so the
        vectorized traversal can statically unroll leaf tests; pass False for
        the reference builder's exact tree shape (brute-force path only).

        ``max_blas_tris``: if set, spatially split the mesh into multiple
        draw commands of at most that many triangles each (scene/bvh.py
        split_mesh) — required for SMEM-budgeted traversal kernels on large
        meshes; all renderers handle multi-draw banks identically.
        Returns the draw id of the first chunk.
        """
        vertices = np.asarray(vertices, np.float32).reshape(-1, 3)
        indices = np.asarray(indices, np.int32).reshape(-1)
        ntris = len(indices) // 3
        if (max_blas_tris is not None and ntris > max_blas_tris
                and bvh is None):
            from wc_path_tracer_tpu.scene.bvh import split_mesh
            tri_material = np.broadcast_to(
                np.asarray(tri_material, np.int32), (ntris,))
            first = len(self.meshes)
            for sub_v, sub_i, tri_ids in split_mesh(
                    vertices, indices, max_blas_tris):
                # chunk vertices are compacted, so per-chunk normals/uvs
                # would need the same remap; loaders that split pass none
                self.add_mesh(sub_v, sub_i,
                              tri_material=tri_material[tri_ids],
                              robust_bvh=robust_bvh)
            return first
        if bvh is None:
            # native C++ builder when available (bit-identical to the NumPy
            # oracle; tests/test_native.py), NumPy fallback inside
            from wc_path_tracer_tpu.scene.native import build_bvh_native
            bvh = build_bvh_native(vertices, indices, robust=robust_bvh)
        tri_material = np.broadcast_to(
            np.asarray(tri_material, np.int32), (len(indices) // 3,)).copy()
        self.meshes.append(dict(
            vertices=vertices, indices=indices,
            normals=np.zeros_like(vertices) if normals is None
            else np.asarray(normals, np.float32).reshape(-1, 3),
            uvs=np.zeros((len(vertices), 2), np.float32) if uvs is None
            else np.asarray(uvs, np.float32).reshape(-1, 2),
            tri_material=tri_material, bvh=bvh))
        return len(self.meshes) - 1

    def build(self, material_capacity=None, sphere_capacity=None,
              vertex_capacity=None, index_capacity=None,
              node_capacity=None, draw_capacity=None) -> Scene:
        def cap(n, c, lo=1):
            n = max(n, lo)
            if c is not None:
                if c < n:
                    raise ValueError(f"capacity {c} < live count {n}")
                return c
            return _round_up_pow2(n)

        mcap = cap(len(self.materials), material_capacity)
        scap = cap(len(self.spheres), sphere_capacity)

        mats = Materials.empty(mcap)
        if self.materials:
            def col(k, dt, d3=False):
                a = np.array([m[k] for m in self.materials], dt)
                return np.pad(a, [(0, mcap - len(a))] + ([(0, 0)] if d3 else []))
            mats = dataclasses.replace(
                mats,
                mtype=jnp.asarray(col("mtype", np.int32)),
                albedo=jnp.asarray(col("albedo", np.float32, True)),
                emission=jnp.asarray(col("emission", np.float32, True)),
                emission_strength=jnp.asarray(col("emission_strength", np.float32)),
                metallic=jnp.asarray(col("metallic", np.float32)),
                roughness=jnp.asarray(col("roughness", np.float32)),
                absorption=jnp.asarray(col("absorption", np.float32, True)),
                absorption_strength=jnp.asarray(np.pad(
                    np.array([m["absorption_strength"] for m in self.materials], np.float32),
                    (0, mcap - len(self.materials)), constant_values=1.0)),
                ior=jnp.asarray(np.pad(
                    np.array([m["ior"] for m in self.materials], np.float32),
                    (0, mcap - len(self.materials)), constant_values=1.0)),
            )
        mats = dataclasses.replace(mats, count=jnp.asarray(len(self.materials), I32))

        sph = Spheres.empty(scap)
        if self.spheres:
            pos = np.zeros((scap, 3), np.float32)
            rad = np.zeros(scap, np.float32)
            mat = np.zeros(scap, np.int32)
            for i, (p, r, m) in enumerate(self.spheres):
                pos[i], rad[i], mat[i] = p, r, m
            sph = Spheres(position=jnp.asarray(pos), radius=jnp.asarray(rad),
                          material=jnp.asarray(mat),
                          count=jnp.asarray(len(self.spheres), I32))
        else:
            sph = dataclasses.replace(sph, count=jnp.asarray(0, I32))

        mesh = self._build_mesh_bank(vertex_capacity, index_capacity,
                                     node_capacity, draw_capacity)
        return Scene(materials=mats, spheres=sph, mesh=mesh)

    def _build_mesh_bank(self, vertex_capacity, index_capacity,
                         node_capacity, draw_capacity) -> MeshBank:
        nv = sum(len(m["vertices"]) for m in self.meshes)
        ni = sum(len(m["indices"]) for m in self.meshes)
        nn = sum(len(m["bvh"].node_min) for m in self.meshes)
        nd = len(self.meshes)

        def cap(n, c, lo):
            n = max(n, lo)
            if c is not None:
                if c < n:
                    raise ValueError(f"capacity {c} < live count {n}")
                return c
            return _round_up_pow2(n)

        vcap = cap(nv, vertex_capacity, 8)
        icap = 3 * ((cap(ni, index_capacity, 24) + 2) // 3)
        ncap = cap(nn, node_capacity, 8)
        dcap = cap(nd, draw_capacity, 1)

        bank = MeshBank.empty(vcap, icap, ncap, dcap)
        if not self.meshes:
            return bank

        verts = np.zeros((vcap, 3), np.float32)
        norms = np.zeros((vcap, 3), np.float32)
        uvs = np.zeros((vcap, 2), np.float32)
        idx = np.zeros(icap, np.int32)
        trimat = np.zeros(icap // 3, np.int32)
        tridraw = np.full(icap // 3, -1, np.int32)
        trineigh = np.full((icap // 3, 3), -1, np.int32)
        node_min = np.full((ncap, 3), np.finfo(np.float32).max, np.float32)
        node_max = np.full((ncap, 3), -np.finfo(np.float32).max, np.float32)
        node_left = np.zeros(ncap, np.int32)
        node_count = np.zeros(ncap, np.int32)
        node_escape = np.full(ncap, -1, np.int32)
        dvo = np.zeros(dcap, np.int32)
        dio = np.zeros(dcap, np.int32)
        dno = np.zeros(dcap, np.int32)
        dic = np.zeros(dcap, np.int32)

        vo = io = no = 0
        for d, m in enumerate(self.meshes):
            V, I, N = len(m["vertices"]), len(m["indices"]), len(m["bvh"].node_min)
            verts[vo:vo + V] = m["vertices"]
            norms[vo:vo + V] = m["normals"]
            uvs[vo:vo + V] = m["uvs"]
            idx[io:io + I] = m["bvh"].indices  # BVH-reordered index buffer
            trimat[io // 3:(io + I) // 3] = m["tri_material"][m["bvh"].tri_order]
            tridraw[io // 3:(io + I) // 3] = d
            # adjacency over the BVH-reordered triangles, shifted bank-global
            nbr = triangle_neighbors(m["vertices"], m["bvh"].indices)
            trineigh[io // 3:(io + I) // 3] = np.where(
                nbr >= 0, nbr + io // 3, -1)
            node_min[no:no + N] = m["bvh"].node_min
            node_max[no:no + N] = m["bvh"].node_max
            node_left[no:no + N] = m["bvh"].node_left
            node_count[no:no + N] = m["bvh"].node_count
            node_escape[no:no + N] = escape_links(
                m["bvh"].node_left, m["bvh"].node_count)
            dvo[d], dio[d], dno[d], dic[d] = vo, io, no, I
            vo, io, no = vo + V, io + I, no + N

        max_leaf = max(1, int(np.max(node_count)) // 3 + (int(np.max(node_count)) % 3 > 0))
        return MeshBank(
            vertices=jnp.asarray(verts), normals=jnp.asarray(norms),
            uvs=jnp.asarray(uvs), indices=jnp.asarray(idx),
            tri_material=jnp.asarray(trimat),
            tri_draw=jnp.asarray(tridraw),
            tri_neighbor=jnp.asarray(trineigh),
            bvh_min=jnp.asarray(node_min), bvh_max=jnp.asarray(node_max),
            bvh_left=jnp.asarray(node_left), bvh_count=jnp.asarray(node_count),
            bvh_escape=jnp.asarray(node_escape),
            draw_vertex_offset=jnp.asarray(dvo), draw_index_offset=jnp.asarray(dio),
            draw_node_offset=jnp.asarray(dno), draw_index_count=jnp.asarray(dic),
            draw_count=jnp.asarray(nd, I32),
            max_leaf_tris=max_leaf,
        )


def triangle_neighbors(vertices: np.ndarray, indices: np.ndarray) -> np.ndarray:
    """(T, 3) int32 neighbor triangle ids (mesh-local), -1 = boundary.

    Edge k of triangle t spans its vertices (k, (k+1)%3) — i.e. (a,b),
    (b,c), (c,a).  Adjacency is keyed on vertex POSITIONS (exact bitwise
    match), not vertex ids, so vertices duplicated by the OBJ loader's
    (v,vt,vn) dedup or by normal splits still stitch into one surface.
    An edge shared by exactly two triangles links them; boundary edges and
    non-manifold edges (>2 faces) stay -1 (the silhouette estimator treats
    -1 as a silhouette edge — correct for boundaries, conservative for
    non-manifold seams).

    Consumed by the mesh silhouette-gradient estimator (render/golden.py
    intersect_primary_edge); the reference has no analog (no gradients,
    SURVEY §2.6).
    """
    tri = np.asarray(indices, np.int64).reshape(-1, 3)
    T = len(tri)
    nbr = np.full((T, 3), -1, np.int32)
    if T == 0:
        return nbr
    # collapse position-identical vertices to one key
    _, vkey = np.unique(np.asarray(vertices, np.float32)[..., :3],
                        axis=0, return_inverse=True)
    k = vkey[tri]                                   # (T, 3)
    e0 = np.stack([k[:, 0], k[:, 1]], 1)
    e1 = np.stack([k[:, 1], k[:, 2]], 1)
    e2 = np.stack([k[:, 2], k[:, 0]], 1)
    edges = np.sort(np.concatenate([e0, e1, e2]), axis=1)   # (3T, 2)
    keys = edges[:, 0] * (vkey.max() + 1) + edges[:, 1]
    owner_tri = np.tile(np.arange(T), 3)
    owner_slot = np.repeat(np.arange(3), T)
    uniq, inv, counts = np.unique(keys, return_inverse=True,
                                  return_counts=True)
    # pair up edges appearing exactly twice
    order = np.argsort(inv, kind="stable")
    starts = np.zeros(len(uniq), np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    two = np.where(counts == 2)[0]
    for g in two:
        i0, i1 = order[starts[g]], order[starts[g] + 1]
        t0, s0 = owner_tri[i0], owner_slot[i0]
        t1, s1 = owner_tri[i1], owner_slot[i1]
        if t0 != t1:
            nbr[t0, s0] = t1
            nbr[t1, s1] = t0
    return nbr


def escape_links(node_left: np.ndarray, node_count: np.ndarray) -> np.ndarray:
    """DFS escape links for stackless BVH traversal (mesh-local indices).

    After finishing node i's subtree the walk jumps to escape[i]; -1 means
    the whole tree is done.  Children are stored contiguously by the builder
    (leftNode, leftNode+1 — same allocation scheme as the reference,
    src/PathTracingRenderer.jai:177-180), so escape(left) = right sibling and
    escape(right) = escape(parent).  Iterative (the reference caps depth at
    32, but keep this robust to any tree)."""
    n = len(node_left)
    esc = np.full(n, -1, np.int32)
    if n == 0:
        return esc
    stack = [(0, -1)]
    while stack:
        node, e = stack.pop()
        esc[node] = e
        if node_count[node] == 0:  # inner
            left = int(node_left[node])
            stack.append((left + 1, e))
            stack.append((left, left + 1))
    return esc


def _round_up_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p

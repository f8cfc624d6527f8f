"""Trainable-parameter registry for inverse rendering.

Maps trainable names to scene/camera pytree leaves, with projection ranges
applied after each optimizer step (the headless analog of the reference
property editor's @Range annotations, src/ui_utils.jai:120-140).

Three families (BASELINE north star: "albedo, roughness, emission, vertex
positions" in the gradient all-reduce set):

- material fields (scene.materials.*)
- geometry: sphere positions/radii, mesh vertex positions
- camera: position / yaw / pitch / fov (camera matrices are rebuilt
  differentiably inside the loss, scene/camera.py is pure jnp)

Gradients for geometry flow through the differentiable re-shade of the
detached closest-hit search on BOTH production paths (render/golden.py
intersect_scene_brute; render/sweep.py's attached cluster-slab re-fetch
carries vertex gradients too): exact for interior parameters.  Silhouette
(visibility) terms are estimated when ``cfg.edge_grads`` is on (the
coverage estimator, golden.intersect_primary_edge — sphere silhouettes on
primary rays); with it off, hit/miss boundaries carry zero gradient (the
plain detached estimator, exact in expectation for interior params only).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

# name -> (projection lo, hi)
MATERIAL_PARAMS = {
    "albedo": (0.0, 1.0),
    "emission": (0.0, None),
    "emission_strength": (0.0, None),
    "metallic": (0.0, 1.0),
    "roughness": (0.0, 1.0),
    "absorption": (0.0, None),
    "absorption_strength": (0.0, None),
    "ior": (1.0, None),
}

GEOMETRY_PARAMS = {
    "sphere_position": (None, None),
    "sphere_radius": (1e-3, None),    # radius must stay positive
    "vertices": (None, None),
}

CAMERA_PARAMS = {
    "camera_position": (None, None),
    "camera_yaw": (None, None),
    "camera_pitch": (-89.9, 89.9),    # keep look_at's up vector valid
    "camera_fov": (5.0, 175.0),
}

ALL_PARAMS = {**MATERIAL_PARAMS, **GEOMETRY_PARAMS, **CAMERA_PARAMS}


def validate(trainable) -> tuple:
    unknown = [k for k in trainable if k not in ALL_PARAMS]
    if unknown:
        raise ValueError(
            f"unknown trainable parameter(s) {unknown}; "
            f"options: {sorted(ALL_PARAMS)}")
    return tuple(trainable)


def get_params(scene, camera, trainable) -> dict:
    """Extract the trainable leaves as a flat {name: array} dict."""
    out = {}
    for k in trainable:
        if k in MATERIAL_PARAMS:
            out[k] = getattr(scene.materials, k)
        elif k == "sphere_position":
            out[k] = scene.spheres.position
        elif k == "sphere_radius":
            out[k] = scene.spheres.radius
        elif k == "vertices":
            out[k] = scene.mesh.vertices
        elif k.startswith("camera_"):
            from wc_path_tracer_tpu.scene.camera import Camera
            if not isinstance(camera, Camera):
                raise ValueError(
                    f"{k} requires a scene.camera.Camera, got "
                    f"{type(camera).__name__} (prebuilt matrices cannot be "
                    "optimized)")
            out[k] = getattr(camera, k[len("camera_"):])
        else:  # pragma: no cover - validate() screens this
            raise ValueError(k)
    return out


def apply_params(scene, camera, params):
    """Write a {name: array} dict back into (scene, camera) pytrees."""
    mat_kw = {k: v for k, v in params.items() if k in MATERIAL_PARAMS}
    if mat_kw:
        scene = dataclasses.replace(
            scene, materials=dataclasses.replace(scene.materials, **mat_kw))
    sph_kw = {}
    if "sphere_position" in params:
        sph_kw["position"] = params["sphere_position"]
    if "sphere_radius" in params:
        sph_kw["radius"] = params["sphere_radius"]
    if sph_kw:
        scene = dataclasses.replace(
            scene, spheres=dataclasses.replace(scene.spheres, **sph_kw))
    if "vertices" in params:
        scene = dataclasses.replace(
            scene, mesh=dataclasses.replace(scene.mesh,
                                            vertices=params["vertices"]))
    cam_kw = {k[len("camera_"):]: v for k, v in params.items()
              if k.startswith("camera_")}
    if cam_kw:
        camera = dataclasses.replace(camera, **cam_kw)
    return scene, camera


def project_params(params: dict) -> dict:
    """Clamp each parameter to its valid range after an optimizer step."""
    out = {}
    for k, v in params.items():
        lo, hi = ALL_PARAMS.get(k, (None, None))
        if lo is not None:
            v = jnp.maximum(v, lo)
        if hi is not None:
            v = jnp.minimum(v, hi)
        out[k] = v
    return out

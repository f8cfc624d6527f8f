"""Camera model: yaw/pitch fly camera with look-at view + perspective projection.

Reference: Camera + Update, src/PathTracingRenderer.jai:6-36 — yaw/pitch to
direction, look-at view matrix, perspective projection (near 0.1, far 100,
default fov 90), with cached inverses consumed by the kernel's per-pixel ray
reconstruction (pathTracer.comp:292-302).

Everything is jnp and differentiable so camera parameters can be optimized in
inverse rendering.  Matrices are row-major with column-vector convention
(m @ v), the logical convention the reference's shader sees after its
transpose dance (SURVEY §2.1 Camera).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

import numpy as np

F32 = np.float32  # np scalar ctor: jnp.float32(x) would create device consts


def _pytree(cls):
    cls = dataclasses.dataclass(cls)
    return jax.tree_util.register_dataclass(cls)


@_pytree
class Camera:
    """Dynamic camera state. Defaults mirror the reference struct
    (position origin, yaw 0, pitch 0, fov 90)."""

    position: jax.Array  # (3,) f32
    yaw: jax.Array       # () f32, degrees
    pitch: jax.Array     # () f32, degrees
    fov: jax.Array       # () f32, degrees vertical

    @staticmethod
    def create(position=(0.0, 0.0, 0.0), yaw=-90.0, pitch=0.0, fov=90.0) -> "Camera":
        """Note: the reference's *struct* default yaw is 0 (looking +x); its
        editor only shows the default scene after mouse-look.  Our default
        yaw=-90 looks down -z at the default scene — a conscious divergence
        (the yaw/pitch -> direction formula itself is identical)."""
        return Camera(
            position=jnp.asarray(position, F32),
            yaw=jnp.asarray(yaw, F32),
            pitch=jnp.asarray(pitch, F32),
            fov=jnp.asarray(fov, F32),
        )

    @property
    def direction(self) -> jax.Array:
        """yaw/pitch -> unit direction (PathTracingRenderer.jai:23-26)."""
        ry = jnp.deg2rad(self.yaw)
        rp = jnp.deg2rad(self.pitch)
        cp = jnp.cos(rp)
        d = jnp.stack([jnp.cos(ry) * cp, jnp.sin(rp), jnp.sin(ry) * cp])
        return d / jnp.linalg.norm(d)


def look_at(eye, center, up=(0.0, 1.0, 0.0)):
    """Right-handed look-at view matrix (world -> camera)."""
    eye = jnp.asarray(eye, F32)
    f = jnp.asarray(center, F32) - eye
    f = f / jnp.linalg.norm(f)
    up = jnp.asarray(up, F32)
    s = jnp.cross(f, up)
    s = s / jnp.linalg.norm(s)
    u = jnp.cross(s, f)
    m = jnp.stack([
        jnp.concatenate([s, jnp.array([-jnp.dot(s, eye)])]),
        jnp.concatenate([u, jnp.array([-jnp.dot(u, eye)])]),
        jnp.concatenate([-f, jnp.array([jnp.dot(f, eye)])]),
        jnp.array([0.0, 0.0, 0.0, 1.0], F32),
    ])
    return m


def perspective(fov_y_deg, aspect, near=0.1, far=100.0):
    """GL-style right-handed perspective projection.

    near/far fixed at 0.1/100 in the reference (PathTracingRenderer.jai:32).
    """
    g = F32(1.0) / jnp.tan(jnp.deg2rad(jnp.asarray(fov_y_deg, F32)) * F32(0.5))
    near, far = F32(near), F32(far)
    z = F32(0.0)
    return jnp.stack([
        jnp.stack([g / F32(aspect), z, z, z]),
        jnp.stack([z, g, z, z]),
        jnp.stack([z, z, (far + near) / (near - far), F32(2.0) * far * near / (near - far)]),
        jnp.stack([z, z, F32(-1.0), z]),
    ])


@_pytree
class CameraMatrices:
    """What the kernel consumes: inverses + position (SceneData, pathTracer.comp:10-19)."""

    inverse_projection: jax.Array  # (4, 4)
    inverse_view: jax.Array        # (4, 4)
    position: jax.Array            # (3,)


def camera_matrices(camera: Camera, aspect: float) -> CameraMatrices:
    """Build view/proj and invert, as the reference's Update does
    (PathTracingRenderer.jai:22-36).

    Runs under full-f32 matmul precision: the 4x4 inverses and dot products
    must not go through the MXU's default bf16 multiply path.
    """
    with jax.default_matmul_precision("highest"):
        view = look_at(camera.position, camera.position + camera.direction)
        proj = perspective(camera.fov, aspect)
        return CameraMatrices(
            inverse_projection=jnp.linalg.inv(proj),
            inverse_view=jnp.linalg.inv(view),
            position=camera.position,
        )


def primary_ray_directions(mats: CameraMatrices, width: int, height: int,
                           jitter=None):
    """Per-pixel world-space ray directions, (H, W, 3).

    Transcribes pathTracer.comp:289-302: pixel-center NDC with a y flip, then
    target = invProj @ (x, y, 1, 1); dir = normalize(invView @ (normalize(target.xyz
    / target.w), 0)).

    ``jitter``: optional (H, W, 2) subpixel offsets in [0,1) (extension — the
    reference never jitters, quirk §2.4(5)).
    """
    x = (jnp.arange(width, dtype=F32) + F32(0.5)) / F32(width)
    y = (jnp.arange(height, dtype=F32) + F32(0.5)) / F32(height)
    cx, cy = jnp.meshgrid(x, y)  # (H, W)
    if jitter is not None:
        cx = cx + (jitter[..., 0] - F32(0.5)) / F32(width)
        cy = cy + (jitter[..., 1] - F32(0.5)) / F32(height)
    cy = F32(1.0) - cy                      # y flip (pathTracer.comp:296)
    cx = cx * F32(2.0) - F32(1.0)           # -> [-1, 1]
    cy = cy * F32(2.0) - F32(1.0)

    # TPU-critical: einsum/matmul default to bf16 multiplies on the MXU;
    # the projective w-component is a catastrophic cancellation
    # ((n-f)/2fn + (f+n)/2fn = 1/f) that bf16 rounds to exactly 0 -> inf
    # rays. Full f32 precision is mandatory for camera math.
    hi = jax.lax.Precision.HIGHEST
    ndc = jnp.stack([cx, cy, jnp.ones_like(cx), jnp.ones_like(cx)], axis=-1)
    target = jnp.einsum("ij,hwj->hwi", mats.inverse_projection, ndc,
                        precision=hi)
    d_cam = target[..., :3] / target[..., 3:4]
    d_cam = d_cam / jnp.linalg.norm(d_cam, axis=-1, keepdims=True)
    d_cam4 = jnp.concatenate([d_cam, jnp.zeros_like(d_cam[..., :1])], axis=-1)
    d_world = jnp.einsum("ij,hwj->hwi", mats.inverse_view, d_cam4,
                         precision=hi)[..., :3]
    return d_world / jnp.linalg.norm(d_world, axis=-1, keepdims=True)

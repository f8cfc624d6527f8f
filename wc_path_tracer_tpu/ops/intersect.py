"""Vectorized ray-primitive intersectors.

Math transcribed from the reference kernel (src/shaders/pathTracer.comp:97-133)
but written as batched array ops: on TPU a "thread" is a vector lane, so every
intersector maps over arbitrary leading batch dimensions instead of scalar
per-thread code.  Conventions:

- rays are (origin, direction, inv_direction) float32 arrays with a trailing
  axis of 3; any broadcastable leading shape is allowed.
- "no hit" is signalled by sentinel values identical to the reference's
  (-1.0 for spheres/triangles, empty interval for boxes) so that downstream
  comparisons reproduce reference behavior exactly.

Everything here is differentiable; these functions are used by both the
golden renderer (render/golden.py) and the autodiff path.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

F32 = np.float32  # np scalar ctor: jnp.float32(x) would create device consts
KINFINITY = np.float32(3.402823466e38)  # constants.glsl kInfinity


def safe_sqrt(x):
    """sqrt(max(x, 0)) with a finite (zero) gradient at and below x == 0.

    ``jnp.sqrt(jnp.maximum(x, 0))`` has derivative inf at x == 0, and the
    chain rule turns inf * 0 into NaN for every lane sitting at or below the
    clamp — even when the result is masked out by jnp.where downstream (the
    transpose sends a zero cotangent, and 0 * inf = NaN).  The double-where
    pattern keeps the forward value bit-identical while pinning the gradient
    of the clamped region to 0.
    """
    pos = x > F32(0.0)
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, x, F32(1.0))), F32(0.0))


def ray_box(origin, inv_direction, bmin, bmax):
    """Slab test. Returns (t0, t1) entry/exit distances.

    Reference: rayBoxIntersect, pathTracer.comp:97-108.  A hit exists iff
    t0 <= t1 and t1 >= 0 (callers test `t0 > t1 || t1 < 0` to skip,
    pathTracer.comp:162).
    """
    tbot = (bmin - origin) * inv_direction
    ttop = (bmax - origin) * inv_direction
    tmin = jnp.minimum(ttop, tbot)
    tmax = jnp.maximum(ttop, tbot)
    t0 = jnp.max(tmin, axis=-1)
    t1 = jnp.min(tmax, axis=-1)
    return t0, t1


def ray_sphere(origin, direction, center, radius):
    """Quadratic sphere test returning both roots (near, far).

    Reference: raySphereIntersect, pathTracer.comp:110-119.  When the
    discriminant is negative both roots are the sentinel -1.0 exactly as the
    reference returns vec2(-1.0).  direction is assumed normalized (the
    reference relies on this: no `a` coefficient).
    """
    oc = origin - center
    b = jnp.sum(oc * direction, axis=-1)
    c = jnp.sum(oc * oc, axis=-1) - radius * radius
    disc = b * b - c
    s = safe_sqrt(disc)  # missed lanes otherwise NaN-poison reverse mode
    near = -b - s
    far = -b + s
    miss = disc < F32(0.0)
    sentinel = F32(-1.0)
    return jnp.where(miss, sentinel, near), jnp.where(miss, sentinel, far)


def ray_triangle(origin, direction, a, b, c):
    """Möller-Trumbore-style test. Returns (t, u, v, hit_mask).

    Reference: rayTriangleIntersect, pathTracer.comp:121-133.  The reference
    returns t=-1 on miss and accepts hits with
    ``t > 0 && u in [0,1] && v >= 0 && u+v <= 1`` — note it checks ``uv.x <= 1``
    but never ``uv.y <= 1`` on its own (the u+v test covers it).  Degenerate
    triangles divide by zero; IEEE inf/nan propagation then fails the
    acceptance test, matching GPU behavior.
    """
    edge_ab = b - a
    edge_ac = c - a
    oa = origin - a
    pvec = jnp.cross(direction, edge_ac)
    inv_det = F32(1.0) / jnp.sum(edge_ab * pvec, axis=-1)
    qvec = jnp.cross(oa, edge_ab)
    u = jnp.sum(oa * pvec, axis=-1) * inv_det
    v = jnp.sum(direction * (qvec * inv_det[..., None]), axis=-1)
    t = jnp.sum(edge_ac * qvec, axis=-1) * inv_det
    hit = (t > F32(0.0)) & (u >= F32(0.0)) & (u <= F32(1.0)) & (v >= F32(0.0)) & (u + v <= F32(1.0))
    t = jnp.where(hit, t, F32(-1.0))
    return t, u, v, hit


def ray_triangle_reshade(origin, direction, a, b, c):
    """ray_triangle with a guarded determinant, for differentiable re-shade.

    The closest-hit *search* keeps the reference's exact IEEE semantics
    (degenerate det -> inf/NaN -> miss).  The *re-shade* of the detached
    winner must not: lanes with no real winner (miss lanes re-shading a
    placeholder triangle, or near-parallel rays) would put inf/NaN into the
    unselected branch of the downstream jnp.where, and reverse mode turns
    0 * inf into NaN for every parameter upstream once origin/direction are
    differentiable.  Guarding det changes the forward value only for lanes
    whose result is masked out anyway (a detached search never selects a
    degenerate winner as a hit).  Returns t only.
    """
    edge_ab = b - a
    edge_ac = c - a
    oa = origin - a
    pvec = jnp.cross(direction, edge_ac)
    det = jnp.sum(edge_ab * pvec, axis=-1)
    safe_det = jnp.where(jnp.abs(det) < F32(1e-12), F32(1.0), det)
    inv_det = F32(1.0) / safe_det   # reciprocal form: bit-identical to
    qvec = jnp.cross(oa, edge_ab)   # ray_triangle for non-degenerate lanes
    return jnp.sum(edge_ac * qvec, axis=-1) * inv_det


def ray_triangle_sweep(origin, direction, a, b, c):
    """All-pairs Möller-Trumbore sweep: (R,3) rays x (T,3) triangles -> (R,T).

    Returns (t, hit_mask), the two outputs the closest-hit search consumes.
    Same math as ray_triangle but computed on per-component (R,T) arrays
    (structure-of-arrays): a broadcasted (R,1,3)x(1,T,3) formulation keeps
    trailing-length-3 intermediates, which XLA:TPU pads to 128 lanes —
    measured 3x slower on the live chip (tools/exp_tri_sweep.py: 21 ms vs
    7 ms for a 2^20 x 43 sweep).  Values can differ from ray_triangle by
    fma-contraction rounding (XLA contracts differently per fusion), which
    the acceptance tests tolerate.
    """
    ox, oy, oz = origin[:, 0:1], origin[:, 1:2], origin[:, 2:3]   # (R,1)
    dx, dy, dz = direction[:, 0:1], direction[:, 1:2], direction[:, 2:3]
    ax, ay, az = a[None, :, 0], a[None, :, 1], a[None, :, 2]      # (1,T)
    bx, by, bz = b[None, :, 0], b[None, :, 1], b[None, :, 2]
    cx, cy, cz = c[None, :, 0], c[None, :, 1], c[None, :, 2]

    e1x, e1y, e1z = bx - ax, by - ay, bz - az          # edge_ab
    e2x, e2y, e2z = cx - ax, cy - ay, cz - az          # edge_ac
    oax, oay, oaz = ox - ax, oy - ay, oz - az

    # pvec = direction x edge_ac
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    inv_det = F32(1.0) / (e1x * px + e1y * py + e1z * pz)
    # qvec = oa x edge_ab
    qx = oay * e1z - oaz * e1y
    qy = oaz * e1x - oax * e1z
    qz = oax * e1y - oay * e1x
    u = (oax * px + oay * py + oaz * pz) * inv_det
    v = dx * (qx * inv_det) + dy * (qy * inv_det) + dz * (qz * inv_det)
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    hit = (t > F32(0.0)) & (u >= F32(0.0)) & (u <= F32(1.0)) \
        & (v >= F32(0.0)) & (u + v <= F32(1.0))
    t = jnp.where(hit, t, F32(-1.0))
    return t, hit


def ray_box_sweep(origin, inv_direction, bmin, bmax):
    """All-pairs slab test: (R,3) rays x (C,3)+(C,3) boxes -> (R,C) (t0, t1).

    SoA variant of ray_box (same rationale as ray_triangle_sweep).  A hit
    exists iff t0 <= t1 and t1 >= 0.
    """
    ox, oy, oz = origin[:, 0:1], origin[:, 1:2], origin[:, 2:3]
    ix_, iy, iz = (inv_direction[:, 0:1], inv_direction[:, 1:2],
                   inv_direction[:, 2:3])
    t0 = None
    t1 = None
    for o_c, i_c, lo, hi in ((ox, ix_, bmin[None, :, 0], bmax[None, :, 0]),
                             (oy, iy, bmin[None, :, 1], bmax[None, :, 1]),
                             (oz, iz, bmin[None, :, 2], bmax[None, :, 2])):
        tb = (lo - o_c) * i_c
        tt = (hi - o_c) * i_c
        tmin = jnp.minimum(tb, tt)
        tmax = jnp.maximum(tb, tt)
        t0 = tmin if t0 is None else jnp.maximum(t0, tmin)
        t1 = tmax if t1 is None else jnp.minimum(t1, tmax)
    return t0, t1


def ray_sphere_sweep(origin, direction, center, radius):
    """All-pairs sphere test: (R,3) rays x (S,3) spheres -> (R,S) (near, far).

    SoA variant of ray_sphere (same rationale as ray_triangle_sweep).
    """
    ox, oy, oz = origin[:, 0:1], origin[:, 1:2], origin[:, 2:3]
    dx, dy, dz = direction[:, 0:1], direction[:, 1:2], direction[:, 2:3]
    cx, cy, cz = center[None, :, 0], center[None, :, 1], center[None, :, 2]

    ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
    b = ocx * dx + ocy * dy + ocz * dz
    c = ocx * ocx + ocy * ocy + ocz * ocz - radius[None, :] * radius[None, :]
    disc = b * b - c
    s = safe_sqrt(disc)
    miss = disc < F32(0.0)
    sentinel = F32(-1.0)
    return (jnp.where(miss, sentinel, -b - s),
            jnp.where(miss, sentinel, -b + s))


def reflect(d, n):
    """GLSL reflect: d - 2*dot(d,n)*n."""
    return d - F32(2.0) * jnp.sum(d * n, axis=-1, keepdims=True) * n


def refract(d, n, eta):
    """GLSL refract: returns the zero vector on total internal reflection.

    k = 1 - eta^2 (1 - dot(n,d)^2); k < 0 -> vec3(0).
    eta may be scalar or (...,) matching d's batch shape.
    """
    cos_i = jnp.sum(n * d, axis=-1, keepdims=True)
    eta = jnp.asarray(eta, F32)
    if eta.ndim and eta.shape[-1:] != (1,):
        eta = eta[..., None]
    k = F32(1.0) - eta * eta * (F32(1.0) - cos_i * cos_i)
    tir = k < F32(0.0)
    out = eta * d - (eta * cos_i + safe_sqrt(k)) * n
    return jnp.where(tir, F32(0.0), out), jnp.squeeze(tir, -1)


def normalize(v, eps=None):
    """GLSL normalize (no epsilon guard, matching the reference).

    With ``eps``, the guard is applied to the *squared* norm so zero vectors
    keep a finite (zero) gradient — max(sqrt(0), eps) would still route an
    inf sqrt-gradient into reverse mode.  Forward value is identical
    (monotone composition)."""
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    if eps is not None:
        # eps^2 can underflow f32 (1e-20^2 -> 0); floor at the smallest
        # normal so the guard survives and zero vectors normalize to zero
        guard = F32(max(float(eps) ** 2, 1.1754944e-38))
        n = jnp.sqrt(jnp.maximum(n2, guard))
    else:
        n = jnp.sqrt(n2)
    return v / n

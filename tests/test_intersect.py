"""Unit tests for ray-primitive intersectors against analytic cases."""

import numpy as np
import jax.numpy as jnp

from wc_path_tracer_tpu.ops import intersect as ix


def ray(o, d):
    o = jnp.asarray(o, jnp.float32)
    d = jnp.asarray(d, jnp.float32)
    d = d / jnp.linalg.norm(d)
    return o, d, 1.0 / d


def test_ray_box_hit_and_miss():
    o, d, inv = ray([0, 0, 0], [0, 0, -1])
    t0, t1 = ix.ray_box(o, inv, jnp.array([-1, -1, -3.0]), jnp.array([1, 1, -2.0]))
    assert np.isclose(float(t0), 2.0) and np.isclose(float(t1), 3.0)
    # miss to the side
    t0, t1 = ix.ray_box(o, inv, jnp.array([2, 2, -3.0]), jnp.array([3, 3, -2.0]))
    assert float(t0) > float(t1)
    # box behind: interval valid but negative -> caller rejects via t1 < 0
    t0, t1 = ix.ray_box(o, inv, jnp.array([-1, -1, 2.0]), jnp.array([1, 1, 3.0]))
    assert float(t1) < 0


def test_ray_box_inside():
    o, d, inv = ray([0, 0, 0], [0, 0, -1])
    t0, t1 = ix.ray_box(o, inv, jnp.array([-1, -1, -1.0]), jnp.array([1, 1, 1.0]))
    assert float(t0) < 0 < float(t1)


def test_ray_sphere_two_roots():
    o, d, _ = ray([0, 0, 0], [0, 0, -1])
    near, far = ix.ray_sphere(o, d, jnp.array([0, 0, -5.0]), jnp.float32(1.0))
    assert np.isclose(float(near), 4.0, atol=1e-5)
    assert np.isclose(float(far), 6.0, atol=1e-5)


def test_ray_sphere_miss_returns_minus_one():
    o, d, _ = ray([0, 0, 0], [0, 1, 0])
    near, far = ix.ray_sphere(o, d, jnp.array([0, 0, -5.0]), jnp.float32(1.0))
    assert float(near) == -1.0 and float(far) == -1.0


def test_ray_sphere_inside_near_root_negative():
    # Quirk §2.4(1): reference only tests the near root, so an origin inside
    # the sphere yields near<0 (treated as miss) and far>0.
    o, d, _ = ray([0, 0, -5], [0, 0, -1])
    near, far = ix.ray_sphere(o, d, jnp.array([0, 0, -5.0]), jnp.float32(1.0))
    assert float(near) < 0 < float(far)


def test_ray_triangle_hit_uv():
    o, d, _ = ray([0.2, 0.2, 1.0], [0, 0, -1])
    a, b, c = jnp.array([0, 0, 0.0]), jnp.array([1, 0, 0.0]), jnp.array([0, 1, 0.0])
    t, u, v, hit = ix.ray_triangle(o, d, a, b, c)
    assert bool(hit)
    assert np.isclose(float(t), 1.0, atol=1e-6)
    assert np.isclose(float(u), 0.2, atol=1e-6)
    assert np.isclose(float(v), 0.2, atol=1e-6)


def test_ray_triangle_outside_and_behind():
    a, b, c = jnp.array([0, 0, 0.0]), jnp.array([1, 0, 0.0]), jnp.array([0, 1, 0.0])
    o, d, _ = ray([0.9, 0.9, 1.0], [0, 0, -1])  # u+v > 1
    *_, hit = ix.ray_triangle(o, d, a, b, c)
    assert not bool(hit)
    o, d, _ = ray([0.2, 0.2, -1.0], [0, 0, -1])  # triangle behind
    *_, hit = ix.ray_triangle(o, d, a, b, c)
    assert not bool(hit)


def test_ray_triangle_batched():
    # 128 random rays against 64 random triangles, vs a NumPy oracle
    rng = np.random.default_rng(0)
    o = rng.normal(size=(128, 1, 3)).astype(np.float32)
    d = rng.normal(size=(128, 1, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    tri = rng.normal(size=(64, 3, 3)).astype(np.float32)
    t, u, v, hit = ix.ray_triangle(jnp.asarray(o), jnp.asarray(d),
                                   jnp.asarray(tri[None, :, 0]),
                                   jnp.asarray(tri[None, :, 1]),
                                   jnp.asarray(tri[None, :, 2]))
    assert t.shape == (128, 64)
    # oracle: Möller-Trumbore in float64
    a64, b64, c64 = tri[:, 0].astype(np.float64), tri[:, 1].astype(np.float64), tri[:, 2].astype(np.float64)
    e1, e2 = b64 - a64, c64 - a64
    pv = np.cross(d.astype(np.float64), e2[None])
    det = np.einsum("btk,tk->bt", np.broadcast_to(e1[None], pv.shape), e1) * 0  # placeholder
    det = np.einsum("tk,btk->bt", e1, pv)
    oa = o.astype(np.float64) - a64[None]
    u64 = np.einsum("btk,btk->bt", oa, pv) / det
    qv = np.cross(oa, e1[None])
    v64 = np.einsum("bok,btk->bt", d.astype(np.float64), qv) / det
    t64 = np.einsum("tk,btk->bt", e2, qv) / det
    hit64 = (t64 > 0) & (u64 >= 0) & (u64 <= 1) & (v64 >= 0) & (u64 + v64 <= 1)
    # Compare away from decision boundaries
    margin = (np.abs(t64) > 1e-3) & (np.abs(u64) > 1e-3) & (np.abs(v64) > 1e-3) \
        & (np.abs(u64 + v64 - 1) > 1e-3) & (np.abs(u64 - 1) > 1e-3) & (np.abs(det) > 1e-6)
    agree = (np.asarray(hit) == hit64) | ~margin
    assert agree.all()
    ok = np.asarray(hit) & hit64 & margin
    np.testing.assert_allclose(np.asarray(t)[ok], t64[ok], rtol=1e-3)


def test_reflect_refract():
    d = jnp.array([0.70710678, -0.70710678, 0.0], jnp.float32)
    n = jnp.array([0.0, 1.0, 0.0], jnp.float32)
    r = ix.reflect(d, n)
    np.testing.assert_allclose(np.asarray(r), [0.70710678, 0.70710678, 0.0], atol=1e-6)
    # refraction air->glass bends toward normal
    t, tir = ix.refract(d, n, jnp.float32(1.0 / 1.5))
    assert not bool(tir)
    t = np.asarray(t)
    assert t[1] < 0  # continues downward
    sin_in = 0.70710678
    sin_out = abs(t[0]) / np.linalg.norm(t)
    np.testing.assert_allclose(sin_out, sin_in / 1.5, atol=1e-6)


def test_refract_tir_returns_zero():
    # glass->air at grazing angle: TIR
    d = jnp.array([0.9, -0.43588989, 0.0], jnp.float32)  # sin=0.9 > 1/1.5
    n = jnp.array([0.0, 1.0, 0.0], jnp.float32)
    t, tir = ix.refract(d, n, jnp.float32(1.5))
    assert bool(tir)
    np.testing.assert_array_equal(np.asarray(t), 0.0)

"""Camera math tests: ray reconstruction matches the analytic pinhole model."""

import numpy as np
import jax.numpy as jnp

from wc_path_tracer_tpu.scene import camera as cam


def test_center_pixel_looks_along_camera_direction():
    c = cam.Camera.create(position=(0, 0, 0), yaw=-90.0, pitch=0.0, fov=90.0)
    np.testing.assert_allclose(np.asarray(c.direction), [0, 0, -1], atol=1e-6)
    mats = cam.camera_matrices(c, aspect=1.0)
    # odd resolution -> exact center pixel
    dirs = cam.primary_ray_directions(mats, 3, 3)
    np.testing.assert_allclose(np.asarray(dirs[1, 1]), [0, 0, -1], atol=1e-6)


def test_corner_rays_match_fov():
    c = cam.Camera.create(position=(0, 0, 0), yaw=-90.0, pitch=0.0, fov=90.0)
    mats = cam.camera_matrices(c, aspect=1.0)
    H = W = 64
    dirs = np.asarray(cam.primary_ray_directions(mats, W, H))
    # top edge of image: tan(fov/2)=1 => at NDC y=+1 the dir is (0,1,-1)/sqrt2;
    # pixel centers are half a pixel in, so y_ndc = 1 - 1/H
    d = dirs[0, W // 2]
    y_ndc = 1.0 - 1.0 / H
    x_ndc = (W // 2 + 0.5) / W * 2 - 1
    expect = np.array([x_ndc, y_ndc, -1.0])
    expect /= np.linalg.norm(expect)
    np.testing.assert_allclose(d, expect, atol=1e-5)


def test_y_flip_top_row_points_up():
    c = cam.Camera.create(position=(0, 0, 0), yaw=-90.0, pitch=0.0, fov=90.0)
    mats = cam.camera_matrices(c, aspect=1.0)
    dirs = np.asarray(cam.primary_ray_directions(mats, 8, 8))
    assert dirs[0, :, 1].min() > 0   # row 0 = top of image = +y
    assert dirs[-1, :, 1].max() < 0


def test_aspect_scales_x():
    c = cam.Camera.create(position=(0, 0, 0), yaw=-90.0, pitch=0.0, fov=90.0)
    mats = cam.camera_matrices(c, aspect=2.0)
    dirs = np.asarray(cam.primary_ray_directions(mats, 65, 65))
    d = dirs[32, -1]  # center row, right edge
    # x extent = tan(45deg)*aspect = 2 at NDC x=1; pixel center inset
    x_ndc = (64.5 / 65) * 2 - 1
    expect = np.array([2.0 * x_ndc, 0.0, -1.0])
    expect /= np.linalg.norm(expect)
    np.testing.assert_allclose(d, expect, atol=1e-5)


def test_yaw_pitch_formula_matches_reference():
    # PathTracingRenderer.jai:23-26
    c = cam.Camera.create(yaw=37.0, pitch=-12.0)
    ry, rp = np.radians(37.0), np.radians(-12.0)
    want = np.array([np.cos(ry) * np.cos(rp), np.sin(rp), np.sin(ry) * np.cos(rp)])
    np.testing.assert_allclose(np.asarray(c.direction), want, atol=1e-6)


def test_view_proj_roundtrip():
    c = cam.Camera.create(position=(1.0, 2.0, 3.0), yaw=123.0, pitch=21.0, fov=55.0)
    mats = cam.camera_matrices(c, aspect=1.5)
    view = np.linalg.inv(np.asarray(mats.inverse_view))
    # camera position maps to origin in camera space
    p = view @ np.array([1.0, 2.0, 3.0, 1.0])
    np.testing.assert_allclose(p[:3], 0.0, atol=1e-5)
    # a point along camera direction maps to -z
    d = np.asarray(c.direction)
    q = view @ np.concatenate([np.array([1.0, 2.0, 3.0]) + d, [1.0]])
    np.testing.assert_allclose(q[:3], [0, 0, -1], atol=1e-5)


def test_camera_matrices_differentiable():
    import jax

    def loss(fov):
        c = cam.Camera.create(fov=fov)
        mats = cam.camera_matrices(c, aspect=1.0)
        dirs = cam.primary_ray_directions(mats, 4, 4)
        return jnp.sum(dirs[..., 0] ** 2)

    g = jax.grad(loss)(jnp.float32(60.0))
    assert np.isfinite(float(g)) and float(g) != 0.0

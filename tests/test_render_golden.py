"""Golden renderer behavior tests (SURVEY §4 test strategy)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from wc_path_tracer_tpu.models import builtin
from wc_path_tracer_tpu.render import golden
from wc_path_tracer_tpu.render.renderer import Renderer
from wc_path_tracer_tpu.scene.camera import camera_matrices
from wc_path_tracer_tpu.utils.config import RenderConfig

CFG = RenderConfig(width=32, height=24, samples=1, max_bounces=3)


def _render(scene, cam, cfg, frame=0):
    mats = camera_matrices(cam, cfg.width / cfg.height)
    return np.asarray(golden.render_frame(scene, mats, cfg, frame))


def test_render_finite_and_nonnegative():
    img = _render(builtin.default_scene(), builtin.default_camera(), CFG)
    assert img.shape == (24, 32, 3)
    assert np.isfinite(img).all()
    assert (img >= 0).all()


def test_sky_only_scene_matches_gradient():
    from wc_path_tracer_tpu.scene.types import Scene
    from wc_path_tracer_tpu.scene.camera import primary_ray_directions
    scene = Scene.empty()
    cam = builtin.default_camera()
    cfg = CFG
    img = _render(scene, cam, cfg)
    mats = camera_matrices(cam, cfg.width / cfg.height)
    d = np.asarray(primary_ray_directions(mats, cfg.width, cfg.height))
    a = 0.5 * (d[..., 1:2] + 1.0)
    want = np.array([0.5, 0.7, 1.0]) * (1 - a) + a
    np.testing.assert_allclose(img, want, atol=1e-5)


def test_deterministic_same_frame():
    scene, cam = builtin.default_scene(), builtin.default_camera()
    a = _render(scene, cam, CFG, frame=3)
    b = _render(scene, cam, CFG, frame=3)
    np.testing.assert_array_equal(a, b)


def test_different_frame_different_noise():
    scene, cam = builtin.default_scene(), builtin.default_camera()
    a = _render(scene, cam, CFG, frame=0)
    b = _render(scene, cam, CFG, frame=1)
    assert not np.array_equal(a, b)


def test_emissive_sphere_adds_light():
    scene, cam = builtin.default_scene(), builtin.default_camera()
    img = _render(scene, cam, CFG)
    # left sphere (at x=-1, emission 1.6*1.0) should contain pixels brighter
    # than the sky max (1.0)
    left = img[:, : img.shape[1] // 3]
    assert left.max() > 1.2


def test_max_bounces_zero_still_one_segment():
    # quirk 6: loop runs max_bounces+1 segments, so bounces=0 still shades
    # primary hits (emission + miss sky).
    scene, cam = builtin.default_scene(), builtin.default_camera()
    cfg = CFG.replace(max_bounces=0)
    img = _render(scene, cam, cfg)
    assert img.max() > 1.2  # emissive sphere visible


def test_accumulate_running_mean():
    old = jnp.ones((4, 4, 3)) * 2.0
    new = jnp.zeros((4, 4, 3))
    # frame 0 overwrites
    np.testing.assert_array_equal(np.asarray(golden.accumulate(old, new, 0)), 0.0)
    # frame 3: weight 1/4
    out = np.asarray(golden.accumulate(old, new, 3))
    np.testing.assert_allclose(out, 1.5, atol=1e-6)


def test_progressive_accumulation_equals_mean_of_frames():
    # Inject a deterministic fake render step: frame k is a constant image k+1.
    # After n frames the accumulation must equal mean(1..n).
    frames_seen = []

    def fake_step(scene, mats, cfg, frame_count, old_image):
        k = int(frame_count)
        frames_seen.append(k)
        new = jnp.full((cfg.height, cfg.width, 3), float(k + 1))
        return golden.accumulate(old_image, new, frame_count)

    scene, cam = builtin.default_scene(), builtin.default_camera()
    r = Renderer(scene, cam, CFG, render_fn=fake_step)
    img = np.asarray(r.step(4))
    assert frames_seen == [0, 1, 2, 3]
    np.testing.assert_allclose(img, np.mean([1, 2, 3, 4]), rtol=1e-6)


def test_renderer_edit_resets_accumulation():
    scene, cam = builtin.default_scene(), builtin.default_camera()
    r = Renderer(scene, cam, CFG)
    r.step(2)
    assert r.frame_count == 2
    r.update_sphere(0, position=(0.2, 0.0, -1.0))
    assert r.frame_count == 0
    r.update_material(1, albedo=(1.0, 0.0, 0.0))
    assert r.frame_count == 0
    r.set_camera(yaw=-80.0)
    assert r.frame_count == 0


def test_metal_mirror_reflects_sky():
    # single perfect mirror sphere under gradient sky: reflection must stay
    # within sky color range, tinted by albedo
    from wc_path_tracer_tpu.scene.types import SceneBuilder, MATERIAL_METAL
    b = SceneBuilder()
    m = b.add_material(MATERIAL_METAL, albedo=(1.0, 1.0, 1.0), roughness=0.0)
    b.add_sphere((0.0, 0.0, -2.0), 0.5, m)
    img = _render(b.build(), builtin.default_camera(), CFG)
    assert np.isfinite(img).all()
    assert img.max() <= 1.0 + 1e-5


def test_dielectric_sphere_refracts():
    # true dielectric: rays through the center continue mostly straight ->
    # center pixel should be skyish (bright), not black
    scene = builtin.default_scene(true_dielectric=True)
    cam = builtin.default_camera()
    cfg = CFG.replace(samples=4)
    img = _render(scene, cam, cfg)
    h, w = cfg.height, cfg.width
    center = img[h // 2 - 2: h // 2 + 2, w // 2 - 2: w // 2 + 2]
    assert center.mean() > 0.15


def test_black_sky_scene_dark_except_light():
    scene, cam = builtin.single_triangle_scene()
    cfg = RenderConfig(width=32, height=32, samples=4, max_bounces=1, sky="black")
    img = _render(scene, cam, cfg)
    assert np.isfinite(img).all()
    assert img.max() > 1.0  # the light itself or lit triangle
    # border away from light/triangle is black
    assert img[-1, 0].sum() == 0.0


def test_gradients_flow_to_albedo_and_emission():
    scene, cam = builtin.default_scene(), builtin.default_camera()
    cfg = RenderConfig(width=8, height=8, samples=1, max_bounces=2)
    mats = camera_matrices(cam, 1.0)

    def loss(albedo, emission_strength):
        s = dataclasses.replace(
            scene, materials=dataclasses.replace(
                scene.materials, albedo=albedo,
                emission_strength=emission_strength))
        img = golden.render_frame(s, mats, cfg, 0)
        return jnp.mean(img)

    g_alb, g_em = jax.grad(loss, argnums=(0, 1))(
        scene.materials.albedo, scene.materials.emission_strength)
    g_alb, g_em = np.asarray(g_alb), np.asarray(g_em)
    assert np.isfinite(g_alb).all() and np.isfinite(g_em).all()
    assert np.abs(g_alb).sum() > 0
    assert np.abs(g_em).sum() > 0


def test_render_step_jit_cache():
    # two calls with the same cfg must not retrace (cache hit)
    scene, cam = builtin.default_scene(), builtin.default_camera()
    cfg = CFG
    mats = camera_matrices(cam, cfg.width / cfg.height)
    old = jnp.zeros((cfg.height, cfg.width, 3))
    img1 = golden.render_step(scene, mats, cfg, jnp.uint32(0), old)
    n_traces = golden.render_step._cache_size()
    img2 = golden.render_step(scene, mats, cfg, jnp.uint32(1), img1)
    assert golden.render_step._cache_size() == n_traces


def test_row_chunked_frame_bit_identical():
    """cfg.row_chunks renders the frame as vmapped row bands in one
    dispatch; pixels must equal the flat render bit-for-bit (global pixel
    seeds) — the organization is a pure scheduling change that measured
    +38% fwd+bwd at 1024^2 (BASELINE.md round 5)."""
    scene, cam = builtin.cornell_box_scene()
    mats = camera_matrices(cam, 1.0)
    for kw in (dict(), dict(use_nee=True), dict(pixel_jitter=True),
               dict(edge_grads=True)):
        cfg1 = RenderConfig(width=40, height=40, samples=2, max_bounces=2,
                            sky="black", row_chunks=1, **kw)
        cfg8 = cfg1.replace(row_chunks=8)
        i1 = jax.jit(golden.render_frame, static_argnames="cfg")(
            scene, mats, cfg1, 3)
        i8 = jax.jit(golden.render_frame, static_argnames="cfg")(
            scene, mats, cfg8, 3)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i8),
                                      err_msg=str(kw))

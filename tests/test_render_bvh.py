"""BVH traversal vs brute force equality (SURVEY §4 item 5) + gradients."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wc_path_tracer_tpu.models import builtin
from wc_path_tracer_tpu.render import golden, wavefront
from wc_path_tracer_tpu.scene.camera import camera_matrices
from wc_path_tracer_tpu.scene.types import (
    MATERIAL_LAMBERTIAN, MATERIAL_METAL, SceneBuilder)
from wc_path_tracer_tpu.utils.config import RenderConfig

pytestmark = pytest.mark.design_points  # kept-but-losing backends (BASELINE.md sunset criteria)



def random_soup_scene(n_tris=64, n_spheres=3, seed=0, spread=2.0):
    rng = np.random.default_rng(seed)
    b = SceneBuilder()
    m0 = b.add_material(MATERIAL_LAMBERTIAN, albedo=(0.7, 0.3, 0.3))
    m1 = b.add_material(MATERIAL_METAL, albedo=(0.3, 0.7, 0.3), roughness=0.4)
    centers = rng.normal(size=(n_tris, 1, 3), scale=spread)
    tris = centers + rng.normal(size=(n_tris, 3, 3), scale=0.4)
    v = tris.reshape(-1, 3).astype(np.float32)
    v[:, 2] -= 4.0
    idx = np.arange(n_tris * 3, dtype=np.int32)
    b.add_mesh(v, idx, tri_material=rng.integers(0, 2, n_tris).astype(np.int32))
    for _ in range(n_spheres):
        b.add_sphere(rng.normal(size=3, scale=spread) - [0, 0, 4],
                     abs(rng.normal(scale=0.5)) + 0.2, m1)
    return b.build()


def random_rays(n=512, seed=1):
    rng = np.random.default_rng(seed)
    o = rng.normal(size=(n, 3), scale=1.0).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d[:, 2] -= 0.8  # bias toward the scene
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


CFG = RenderConfig(width=8, height=8)


@pytest.mark.parametrize("n_tris,seed", [(4, 0), (64, 1), (333, 2)])
def test_bvh_hits_equal_brute_force(n_tris, seed):
    scene = random_soup_scene(n_tris=n_tris, seed=seed)
    o, d = random_rays(512, seed + 10)
    rb = golden.intersect_scene_brute(scene, o, d, CFG)
    rv = wavefront.intersect_scene_bvh(scene, o, d, CFG)
    np.testing.assert_array_equal(np.asarray(rb.hit), np.asarray(rv.hit))
    hit = np.asarray(rb.hit)
    # identical winning primitive -> identical t/material/normal/front
    np.testing.assert_allclose(np.asarray(rv.t)[hit], np.asarray(rb.t)[hit],
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(rv.material)[hit],
                                  np.asarray(rb.material)[hit])
    np.testing.assert_array_equal(np.asarray(rv.front)[hit],
                                  np.asarray(rb.front)[hit])
    np.testing.assert_allclose(np.asarray(rv.normal)[hit],
                               np.asarray(rb.normal)[hit], atol=1e-6)


def test_bvh_multiple_draw_commands():
    b = SceneBuilder()
    m = b.add_material(MATERIAL_LAMBERTIAN, albedo=(0.5, 0.5, 0.5))
    # two single-triangle meshes at different depths
    b.add_mesh(np.array([[-1, -1, -2], [1, -1, -2], [0, 1, -2]], np.float32),
               np.array([0, 1, 2], np.int32), tri_material=m)
    b.add_mesh(np.array([[-1, -1, -4], [1, -1, -4], [0, 1, -4]], np.float32),
               np.array([0, 1, 2], np.int32), tri_material=m)
    scene = b.build()
    o = jnp.array([[0.0, 0.0, 0.0], [0.0, 0.0, -3.0]], jnp.float32)
    d = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]], jnp.float32)
    rec = wavefront.intersect_scene_bvh(scene, o, d, CFG)
    np.testing.assert_allclose(np.asarray(rec.t), [2.0, 1.0], atol=1e-6)
    rb = golden.intersect_scene_brute(scene, o, d, CFG)
    np.testing.assert_allclose(np.asarray(rb.t), [2.0, 1.0], atol=1e-6)


def test_bvh_render_matches_brute_render():
    # identical full images: every rand draw happens in the same order for
    # the same hits, so images must be bitwise-comparable up to fp assoc.
    scene = random_soup_scene(n_tris=100, seed=5)
    cam = builtin.default_camera()
    cfg = RenderConfig(width=24, height=16, samples=2, max_bounces=3)
    mats = camera_matrices(cam, cfg.width / cfg.height)
    img_b = np.asarray(golden.render_frame(scene, mats, cfg, 0))
    img_v = np.asarray(wavefront.render_frame(scene, mats, cfg, 0))
    # tiny numeric slop allowed: the BVH path recomputes t via the same
    # formula but XLA may fuse differently
    close = np.isclose(img_v, img_b, rtol=1e-4, atol=1e-5)
    assert close.mean() > 0.995, f"only {close.mean():.4f} of pixels match"


def test_bvh_render_gradients_match_brute():
    scene = random_soup_scene(n_tris=32, seed=3)
    cam = builtin.default_camera()
    cfg = RenderConfig(width=8, height=8, samples=1, max_bounces=2)
    mats = camera_matrices(cam, 1.0)

    def loss(albedo, render_frame):
        s = dataclasses.replace(
            scene, materials=dataclasses.replace(scene.materials, albedo=albedo))
        return jnp.mean(render_frame(s, mats, cfg, 0))

    g_b = jax.grad(lambda a: loss(a, golden.render_frame))(scene.materials.albedo)
    g_v = jax.grad(lambda a: loss(a, wavefront.render_frame))(scene.materials.albedo)
    assert np.isfinite(np.asarray(g_v)).all()
    np.testing.assert_allclose(np.asarray(g_v), np.asarray(g_b),
                               rtol=1e-3, atol=1e-7)


def test_cornell_renders_identically_via_bvh():
    scene, cam = builtin.cornell_box_scene()
    cfg = RenderConfig(width=16, height=16, samples=1, max_bounces=2, sky="black")
    mats = camera_matrices(cam, 1.0)
    img_b = np.asarray(golden.render_frame(scene, mats, cfg, 0))
    img_v = np.asarray(wavefront.render_frame(scene, mats, cfg, 0))
    close = np.isclose(img_v, img_b, rtol=1e-4, atol=1e-5)
    assert close.mean() > 0.99, f"only {close.mean():.4f} of pixels match"

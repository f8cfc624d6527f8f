"""Pallas packet-BVH traversal kernel tests (interpret mode on CPU).

On real TPU the kernel compiles via Mosaic and agrees exactly with the XLA
per-lane walk — hardware parity + throughput recorded in BASELINE.md
("Traversal-backend decision", round-2 rows; 2000-tri soup, 8192 rays, all
hits/offsets equal).  These tests pin the same semantics via the interpreter
so CI without a TPU still covers the kernel.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from wc_path_tracer_tpu.render import golden, wavefront
from wc_path_tracer_tpu.kernels.traversal import packet_bvh_intersect
from wc_path_tracer_tpu.utils.config import RenderConfig

from test_render_bvh import random_soup_scene, random_rays

pytestmark = pytest.mark.design_points  # kept-but-losing backends (BASELINE.md sunset criteria)


KINF = np.float32(3.402823466e38)


def mesh_dict(mesh):
    return dict(vertices=mesh.vertices, bvh_min=mesh.bvh_min,
                bvh_max=mesh.bvh_max, bvh_left=mesh.bvh_left,
                bvh_count=mesh.bvh_count, indices=mesh.indices,
                draw_node_offset=mesh.draw_node_offset,
                draw_index_offset=mesh.draw_index_offset,
                draw_vertex_offset=mesh.draw_vertex_offset,
                draw_count=mesh.draw_count)


@pytest.mark.parametrize("n_tris,seed", [(16, 0), (200, 2)])
def test_packet_kernel_matches_xla_traversal(n_tris, seed):
    scene = random_soup_scene(n_tris=n_tris, n_spheres=0, seed=seed)
    o, d = random_rays(1024, seed + 7)
    t_init = jnp.full((1024,), KINF)
    tj, offj = wavefront._bvh_closest_tri(scene, o, d, t_init)
    t, off = packet_bvh_intersect(o, d, t_init, mesh_dict(scene.mesh),
                                  max_leaf_tris=scene.mesh.max_leaf_tris,
                                  interpret=True)
    np.testing.assert_array_equal(np.asarray(off), np.asarray(offj))
    hit = np.asarray(off) >= 0
    np.testing.assert_allclose(np.asarray(t)[hit], np.asarray(tj)[hit],
                               rtol=1e-6)


def test_packet_kernel_respects_t_init_pruning():
    scene = random_soup_scene(n_tris=64, n_spheres=0, seed=1)
    o, d = random_rays(1024, 3)
    # with t_init = 0 nothing can beat it -> no hits
    t, off = packet_bvh_intersect(o, d, jnp.zeros(1024), mesh_dict(scene.mesh),
                                  max_leaf_tris=scene.mesh.max_leaf_tris,
                                  interpret=True)
    assert (np.asarray(off) == -1).all()


def test_packet_kernel_multi_draw():
    from wc_path_tracer_tpu.scene.types import MATERIAL_LAMBERTIAN, SceneBuilder
    b = SceneBuilder()
    m = b.add_material(MATERIAL_LAMBERTIAN, albedo=(0.5, 0.5, 0.5))
    b.add_mesh(np.array([[-1, -1, -2], [1, -1, -2], [0, 1, -2]], np.float32),
               np.array([0, 1, 2], np.int32), tri_material=m)
    b.add_mesh(np.array([[-1, -1, -4], [1, -1, -4], [0, 1, -4]], np.float32),
               np.array([0, 1, 2], np.int32), tri_material=m)
    scene = b.build()
    o = jnp.zeros((1024, 3), jnp.float32)
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]], jnp.float32), (1024, 1))
    t, off = packet_bvh_intersect(o, d, jnp.full((1024,), KINF),
                                  mesh_dict(scene.mesh),
                                  max_leaf_tris=scene.mesh.max_leaf_tris,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(t), 2.0, atol=1e-6)


def test_intersect_scene_pallas_full_hitrecord():
    scene = random_soup_scene(n_tris=100, n_spheres=3, seed=4)
    o, d = random_rays(1024, 9)
    cfg = RenderConfig(width=8, height=8)
    ra = wavefront.intersect_scene_pallas(scene, o, d, cfg, interpret=True)
    rb = golden.intersect_scene_brute(scene, o, d, cfg)
    np.testing.assert_array_equal(np.asarray(ra.hit), np.asarray(rb.hit))
    hit = np.asarray(rb.hit)
    np.testing.assert_allclose(np.asarray(ra.t)[hit], np.asarray(rb.t)[hit],
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(ra.material)[hit],
                                  np.asarray(rb.material)[hit])


def test_ray_count_must_be_packet_multiple():
    scene = random_soup_scene(n_tris=8, n_spheres=0, seed=0)
    o, d = random_rays(100, 1)
    with pytest.raises(ValueError, match="multiple"):
        packet_bvh_intersect(o, d, jnp.full((100,), KINF),
                             mesh_dict(scene.mesh), interpret=True)


def test_intersect_scene_pallas_pads_ray_count():
    # the user-facing wrapper pads any ray count up to the packet size
    scene = random_soup_scene(n_tris=32, n_spheres=2, seed=5)
    o, d = random_rays(100, 11)
    cfg = RenderConfig(width=10, height=10)
    ra = wavefront.intersect_scene_pallas(scene, o, d, cfg, interpret=True)
    rb = golden.intersect_scene_brute(scene, o, d, cfg)
    np.testing.assert_array_equal(np.asarray(ra.hit), np.asarray(rb.hit))
    hit = np.asarray(rb.hit)
    np.testing.assert_allclose(np.asarray(ra.t)[hit], np.asarray(rb.t)[hit],
                               rtol=1e-5)


def test_chunked_intersect_matches_unchunked():
    # large-bank path: force tiny chunks and check hits agree with brute
    from wc_path_tracer_tpu.kernels.traversal import smem_chunks
    from wc_path_tracer_tpu.models.procedural import bunny_like_scene
    scene, _ = bunny_like_scene(2, max_blas_tris=64)  # 320 tris -> 5+ draws
    mesh = scene.mesh
    assert int(mesh.draw_count) >= 5
    chunks = smem_chunks(mesh, 128)
    assert chunks is not None and len(chunks) >= 2
    o, d = random_rays(1024, 13)
    o = o * 0.5  # keep origins near the unit mesh
    cfg = RenderConfig(width=8, height=8)
    ra = wavefront.intersect_scene_pallas(scene, o, d, cfg, interpret=True,
                                          chunks=chunks)
    rb = golden.intersect_scene_brute(scene, o, d, cfg)
    np.testing.assert_array_equal(np.asarray(ra.hit), np.asarray(rb.hit))
    hit = np.asarray(rb.hit)
    np.testing.assert_allclose(np.asarray(ra.t)[hit], np.asarray(rb.t)[hit],
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(ra.material)[hit],
                                  np.asarray(rb.material)[hit])


def test_split_mesh_partition_is_exact():
    # every original triangle appears exactly once across chunks, geometry
    # preserved under the per-chunk vertex compaction
    from wc_path_tracer_tpu.scene.bvh import split_mesh
    from wc_path_tracer_tpu.models.procedural import bumpy_sphere
    v, idx = bumpy_sphere(2)
    chunks = split_mesh(v, idx, 50)
    seen = np.concatenate([ids for _, _, ids in chunks])
    assert sorted(seen.tolist()) == list(range(len(idx) // 3))
    for sub_v, sub_i, ids in chunks:
        assert len(sub_i) // 3 <= 50
        np.testing.assert_array_equal(
            sub_v[sub_i.reshape(-1, 3)], v[idx.reshape(-1, 3)[ids]])


def test_render_frame_pallas_matches_bvh_render():
    # the full product path (dispatch name "pallas"): pixel-identical to the
    # XLA BVH walk render of the same scene/seed
    scene = random_soup_scene(n_tris=48, n_spheres=2, seed=6)
    from wc_path_tracer_tpu.scene.camera import Camera, camera_matrices
    cam = Camera.create(position=(0.0, 0.0, 3.0))
    cfg = RenderConfig(width=32, height=32, samples=1, max_bounces=1)
    mats = camera_matrices(cam, 1.0)
    img_p = wavefront.render_frame_pallas(scene, mats, cfg, 0)
    img_b = wavefront.render_frame(scene, mats, cfg, 0)
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_b),
                               atol=1e-6)

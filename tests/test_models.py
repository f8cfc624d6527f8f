"""OBJ parser and built-in scene tests."""

import os

import numpy as np
import pytest

from wc_path_tracer_tpu.models.obj import parse_obj
from wc_path_tracer_tpu.models import builtin

OBJ_TEXT = """
# comment
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vt 0 0
vt 1 0
vt 1 1
vn 0 0 1
f 1/1/1 2/2/1 3/3/1 4/1/1
f 1 2 3
"""


def test_parse_quad_fan_triangulation():
    m = parse_obj(OBJ_TEXT, from_text=True)
    # quad -> 2 triangles (fan): (0,1,2), (0,2,3); second face dedups
    assert len(m.indices) == 9
    np.testing.assert_array_equal(m.indices[:6].reshape(2, 3), [[0, 1, 2], [0, 2, 3]])


def test_parse_dedup_distinguishes_attributes():
    m = parse_obj(OBJ_TEXT, from_text=True)
    # face 2 reuses position indices but with no vt/vn -> new vertices
    assert m.vertices.shape[0] == 7  # 4 from quad + 3 from bare face
    np.testing.assert_array_equal(m.indices[6:], [4, 5, 6])
    # positions still correct
    np.testing.assert_allclose(m.vertices[4], [0, 0, 0])


def test_parse_attributes():
    m = parse_obj(OBJ_TEXT, from_text=True)
    np.testing.assert_allclose(m.uvs[1], [1, 0])
    np.testing.assert_allclose(m.normals[0], [0, 0, 1])
    # bare-face vertices have zero attrs (ref bounds-checked copy semantics)
    np.testing.assert_allclose(m.normals[4], [0, 0, 0])


@pytest.mark.skipif(
    not os.path.exists(builtin.REFERENCE_MODELS_DIR + "/mushroom.obj"),
    reason="reference assets unavailable")
def test_parse_mushroom_matches_reference_counts():
    # The reference prints "227 v / 207 f" for mushroom.obj (SURVEY §2.4(12)
    # counts raw file records); parse and sanity check structure.
    m = parse_obj(builtin.REFERENCE_MODELS_DIR + "/mushroom.obj")
    assert len(m.indices) % 3 == 0
    assert len(m.indices) >= 207 * 3  # fan triangulation of 207 faces
    assert m.vertices.shape[0] >= 227
    assert np.isfinite(m.vertices).all()
    assert m.indices.max() < m.vertices.shape[0]


def test_default_scene_structure():
    s = builtin.default_scene()
    assert int(s.materials.count) == 4
    assert int(s.spheres.count) == 4
    # quirk §2.4(3): the "glass" material stays METAL
    assert int(s.materials.mtype[0]) == 0
    np.testing.assert_allclose(np.asarray(s.materials.albedo[0]), [0.0, 0.5, 1.0])
    np.testing.assert_allclose(np.asarray(s.spheres.radius), [0.5, 0.5, 0.5, 100.0])
    # emissive "Left" material: 0.8*2 = 1.6
    np.testing.assert_allclose(np.asarray(s.materials.emission[2]), 1.6)


def test_cornell_scene_structure():
    s, cam = builtin.cornell_box_scene()
    assert int(s.mesh.draw_count) == 1
    n_tris = int(s.mesh.draw_index_count[0]) // 3
    assert n_tris == 2 * 6 + 2 * 10  # 6 quads + 2 boxes x 5 quads
    assert int(s.materials.count) == 4

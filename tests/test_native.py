"""Native C++ scene pipeline vs NumPy oracle equivalence."""

import numpy as np
import pytest

from wc_path_tracer_tpu.scene import native
from wc_path_tracer_tpu.scene.bvh import build_bvh
from wc_path_tracer_tpu.models.obj import parse_obj

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def random_mesh(n_tris=300, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n_tris * 3, 3)).astype(np.float32)
    idx = np.arange(n_tris * 3, dtype=np.int32)
    return v, idx


@pytest.mark.parametrize("robust", [False, True])
@pytest.mark.parametrize("seed", [0, 3])
def test_bvh_native_equals_numpy(robust, seed):
    v, idx = random_mesh(seed=seed)
    a = build_bvh(v, idx, robust=robust)
    b = native.build_bvh_native(v, idx, robust=robust)
    np.testing.assert_array_equal(a.node_left, b.node_left)
    np.testing.assert_array_equal(a.node_count, b.node_count)
    np.testing.assert_allclose(a.node_min, b.node_min, atol=1e-6)
    np.testing.assert_allclose(a.node_max, b.node_max, atol=1e-6)
    np.testing.assert_array_equal(a.indices, b.indices)
    np.testing.assert_array_equal(a.tri_order, b.tri_order)


def test_bvh_native_degenerate_leaf():
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    idx = np.tile(np.array([0, 1, 2], np.int32), 10)
    b = native.build_bvh_native(v, idx, robust=False)
    assert b.num_nodes == 1 and b.node_count[0] == 30
    br = native.build_bvh_native(v, idx, robust=True)
    assert br.node_count.max() <= 6


OBJ_TEXT = """
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


def test_obj_native_equals_numpy():
    a = parse_obj(OBJ_TEXT, from_text=True)
    b = native.parse_obj_native(OBJ_TEXT, from_text=True)
    np.testing.assert_array_equal(a.indices, b.indices)
    np.testing.assert_allclose(a.vertices, b.vertices)
    np.testing.assert_allclose(a.normals, b.normals)
    np.testing.assert_allclose(a.uvs, b.uvs)


def test_obj_native_large_roundtrip(tmp_path):
    # generate a larger obj and compare
    rng = np.random.default_rng(1)
    V = 500
    lines = [f"v {x} {y} {z}" for x, y, z in rng.normal(size=(V, 3))]
    for _ in range(800):
        a, b, c = rng.integers(1, V + 1, 3)
        lines.append(f"f {a} {b} {c}")
    text = "\n".join(lines)
    a = parse_obj(text, from_text=True)
    b = native.parse_obj_native(text, from_text=True)
    np.testing.assert_array_equal(a.indices, b.indices)
    np.testing.assert_allclose(a.vertices, b.vertices)


def test_native_speedup_on_big_mesh():
    import time
    from wc_path_tracer_tpu.models.procedural import icosphere
    v, idx = icosphere(5)  # 20480 tris
    t0 = time.perf_counter()
    nb = native.build_bvh_native(v, idx, robust=True)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    pb = build_bvh(v, idx, robust=True)
    t_numpy = time.perf_counter() - t0
    np.testing.assert_array_equal(nb.node_left, pb.node_left)
    np.testing.assert_array_equal(nb.indices, pb.indices)
    assert t_native < t_numpy, (t_native, t_numpy)

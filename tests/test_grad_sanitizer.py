"""Finite-gradient sanitizer sweep across the estimator config grid.

VERDICT r3 ask #1: the round-3 NaN shipped because no invariant test swept
gradients across configurations (``jax_debug_nans`` is unusable here — the
padded triangle sweeps produce forward NaN by design, ops/intersect.py).
This is that missing sanitizer layer: ONE backward pass per config point,
differentiating w.r.t. EVERY registered trainable at once, asserting every
gradient leaf is finite.  Any future gradient-path NaN in any estimator
combination fails here before it can ship.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wc_path_tracer_tpu.optim import params as reg
from wc_path_tracer_tpu.render import golden, sweep
from wc_path_tracer_tpu.scene.camera import Camera, camera_matrices
from wc_path_tracer_tpu.scene.types import (
    MATERIAL_DIELECTRIC, MATERIAL_GGX, MATERIAL_LAMBERTIAN, MATERIAL_METAL,
    SceneBuilder)
from wc_path_tracer_tpu.utils.config import RenderConfig


def _full_scene():
    """Every material type + spheres + mesh + an emitter: exercises every
    BSDF branch, NEE lobe split, and both sphere/triangle gradient paths."""
    b = SceneBuilder()
    lam = b.add_material(MATERIAL_LAMBERTIAN, albedo=(0.6, 0.4, 0.3))
    met = b.add_material(MATERIAL_METAL, albedo=(0.9, 0.8, 0.6),
                         roughness=0.2)
    diel = b.add_material(MATERIAL_DIELECTRIC, albedo=(1.0, 1.0, 1.0),
                          ior=1.5, absorption=(0.2, 0.1, 0.0),
                          absorption_strength=0.5)
    ggx = b.add_material(MATERIAL_GGX, albedo=(0.7, 0.7, 0.9),
                         roughness=0.35, metallic=0.8)
    lm = b.add_material(MATERIAL_LAMBERTIAN, emission=(1.0, 0.9, 0.8),
                        emission_strength=4.0)
    b.add_sphere((-0.8, 0.0, -3.0), 0.5, met)
    b.add_sphere((0.8, 0.0, -3.0), 0.5, diel)
    b.add_sphere((0.0, 0.9, -3.0), 0.4, ggx)
    floor = np.array([[-3, -0.6, -6], [3, -0.6, -6], [3, -0.6, 0],
                      [-3, -0.6, -6], [3, -0.6, 0], [-3, -0.6, 0]],
                     np.float32)
    b.add_mesh(floor, np.arange(6, dtype=np.int32), tri_material=lam)
    lquad = np.array([[-1, 2, -4.5], [1, 2, -4.5], [1, 2, -2.5],
                      [-1, 2, -4.5], [1, 2, -2.5], [-1, 2, -2.5]],
                     np.float32)
    b.add_mesh(lquad, np.arange(6, dtype=np.int32), tri_material=lm)
    return b.build(), Camera.create(position=(0.0, 0.2, 0.5))


GRID = [
    # (id-suffix, kwargs, renderer)
    ("plain-golden", {}, "golden"),
    ("nee-golden", {"use_nee": True, "mis": False}, "golden"),
    ("nee-mis-golden", {"use_nee": True, "mis": True}, "golden"),
    ("nee-mis-rr-golden", {"use_nee": True, "mis": True, "use_rr": True,
                           "rr_start_bounce": 1}, "golden"),
    ("nee-mis-rr-compact-golden",
     {"use_nee": True, "mis": True, "use_rr": True, "rr_start_bounce": 1,
      "compact": True, "compact_blocks": 4}, "golden"),
    ("edge-golden", {"edge_grads": True}, "golden"),
    ("edge-nee-mis-golden", {"use_nee": True, "mis": True,
                             "edge_grads": True}, "golden"),
    ("plain-sweep", {}, "sweep"),
    ("nee-mis-sweep", {"use_nee": True, "mis": True}, "sweep"),
    ("nee-mis-rr-sweep", {"use_nee": True, "mis": True, "use_rr": True,
                          "rr_start_bounce": 1}, "sweep"),
]


@pytest.mark.parametrize("name,kw,renderer", GRID,
                         ids=[g[0] for g in GRID])
def test_all_trainable_grads_finite(name, kw, renderer):
    scene, cam = _full_scene()
    cfg = RenderConfig(width=16, height=16, samples=1, max_bounces=3,
                       sky="gradient", **kw)
    render_frame = {"golden": golden.render_frame,
                    "sweep": sweep.render_frame}[renderer]
    mats0 = camera_matrices(cam, 1.0)
    target = render_frame(scene, mats0, cfg, 0) * 0.5

    trainable = reg.validate(tuple(reg.ALL_PARAMS))
    params = reg.get_params(scene, cam, trainable)

    def loss(params):
        s, c = reg.apply_params(scene, cam, params)
        m = camera_matrices(c, 1.0)
        return jnp.mean((render_frame(s, m, cfg, 0) - target) ** 2)

    l, g = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(l)), name
    bad = [k for k, v in g.items() if not bool(jnp.all(jnp.isfinite(v)))]
    assert not bad, f"non-finite gradients in {name}: {bad}"
    # the image must actually depend on the parameters (an all-zero grad
    # dict would make this test vacuous)
    total = sum(float(jnp.sum(jnp.abs(v))) for v in g.values())
    assert total > 0.0, name

"""Round-4 diagnostic: locate the NaN source in the attached-MIS gradient.

Reproduces tests/test_geometry_grads.py's config and reports, per trainable,
whether grads are finite and the AD-vs-FD directional agreement.  Used to
decide attached-vs-detached MIS weights (VERDICT r3 weak #1 / ask #1).
Run: JAX_PLATFORMS=cpu python tools/exp_nan_bisect.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from wc_path_tracer_tpu.optim import params as reg
from wc_path_tracer_tpu.render import golden
from wc_path_tracer_tpu.scene.camera import Camera, camera_matrices
from wc_path_tracer_tpu.scene.types import MATERIAL_LAMBERTIAN, SceneBuilder
from wc_path_tracer_tpu.utils.config import RenderConfig


def _simple_scene():
    b = SceneBuilder()
    m = b.add_material(MATERIAL_LAMBERTIAN, albedo=(0.6, 0.4, 0.3))
    lm = b.add_material(MATERIAL_LAMBERTIAN, emission=(1.0, 1.0, 1.0),
                        emission_strength=3.0)
    b.add_sphere((0.0, 0.0, -3.0), 1.0, m)
    quad = np.array([[-2, 3, -5], [2, 3, -5], [2, 3, -1],
                     [-2, 3, -5], [2, 3, -1], [-2, 3, -1]], np.float32)
    b.add_mesh(quad, np.arange(6, dtype=np.int32), tri_material=lm)
    return b.build(), Camera.create(position=(0.0, 0.0, 1.0))


CFG = RenderConfig(width=24, height=24, samples=1, max_bounces=2,
                   sky="black", use_nee=True)

EPS = {"sphere_position": 3e-3, "sphere_radius": 3e-3, "vertices": 1e-3,
       "camera_position": 3e-3, "camera_yaw": 1e-2, "camera_fov": 1e-2,
       "emission_strength": 1e-2}

for trainable in EPS:
    scene, cam = _simple_scene()
    mats = camera_matrices(cam, 1.0)
    target = golden.render_frame(scene, mats, CFG, 0) * 0.5

    def img_fn(params):
        s, c = reg.apply_params(scene, cam, params)
        m = camera_matrices(c, 1.0)
        return golden.render_frame(s, m, CFG, 0)

    def loss(params):
        return jnp.mean((img_fn(params) - target) ** 2)

    params = reg.get_params(scene, cam, (trainable,))
    g = jax.grad(loss)(params)
    finite = all(bool(jnp.all(jnp.isfinite(v))) for v in g.values())

    rng = np.random.default_rng(0)
    direction = {k: jnp.asarray(rng.normal(size=np.shape(v)), jnp.float32)
                 for k, v in params.items()}
    ad = sum(float(jnp.sum(g[k] * direction[k])) for k in params)
    eps = EPS[trainable]

    def shift(sign):
        return {k: v + sign * eps * direction[k] for k, v in params.items()}

    img0 = img_fn(params)
    dldi = 2.0 * (img0 - target) / img0.size
    dimg = (img_fn(shift(+1)) - img_fn(shift(-1))) / (2 * eps)
    interior = jnp.abs(dimg) * (2 * eps) < 0.05
    fd = float(jnp.sum(jnp.where(interior, dldi * dimg, 0.0)))
    rel = abs(ad - fd) / max(abs(fd), 1e-7)
    print(f"{trainable:20s} finite={finite} ad={ad:+.6e} fd={fd:+.6e} "
          f"rel={rel:.3f}")

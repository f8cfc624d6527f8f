"""Alive-lane stream compaction (golden.trace_rays_compact).

VERDICT round-2 ask #4: the compacted bounce loop had zero tests and a
default compact_from that silently disabled it.  These pin forward + grad
identity against the plain path (compaction only reschedules work), the
resolved default, and the RR config it exists for.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wc_path_tracer_tpu.models import builtin
from wc_path_tracer_tpu.render import golden
from wc_path_tracer_tpu.scene.camera import camera_matrices
from wc_path_tracer_tpu.utils.config import RenderConfig


def _render_pair(cfg_plain, scene, cam, frame=1):
    cfg_c = cfg_plain.replace(compact=True, compact_blocks=8)
    mats = camera_matrices(cam, cfg_plain.width / cfg_plain.height)
    a = jax.jit(golden.render_frame, static_argnames="cfg")(
        scene, mats, cfg_plain, frame)
    b = jax.jit(golden.render_frame, static_argnames="cfg")(
        scene, mats, cfg_c, frame)
    return np.asarray(a), np.asarray(b)


@pytest.mark.parametrize("rr", [False, True])
def test_compact_image_matches_plain(rr):
    scene, cam = builtin.cornell_box_scene()
    cfg = RenderConfig(width=32, height=32, samples=1, max_bounces=6,
                       sky="black", use_nee=True, use_rr=rr,
                       rr_start_bounce=1)
    a, b = _render_pair(cfg, scene, cam)
    # same per-lane math, different schedule: identical up to f32
    # reassociation from different XLA fusions
    np.testing.assert_allclose(b, a, rtol=2e-6, atol=2e-7)


def test_compact_default_from_tracks_rr():
    cfg = RenderConfig(use_rr=True, rr_start_bounce=2)
    assert cfg.compact_from_resolved == 3
    assert RenderConfig().compact_from_resolved == 1
    assert RenderConfig(compact_from=5).compact_from_resolved == 5


def test_compact_grads_match_plain():
    scene, cam = builtin.cornell_box_scene()
    cfg = RenderConfig(width=16, height=16, samples=1, max_bounces=5,
                       sky="black", use_rr=True, rr_start_bounce=1)
    mats = camera_matrices(cam, 1.0)

    def loss(albedo, cfg):
        m = dataclasses.replace(scene.materials, albedo=albedo)
        s = dataclasses.replace(scene, materials=m)
        return jnp.mean(golden.render_frame(s, mats, cfg, 1))

    g_plain = jax.grad(loss)(scene.materials.albedo, cfg)
    g_comp = jax.grad(loss)(scene.materials.albedo,
                            cfg.replace(compact=True, compact_blocks=8))
    np.testing.assert_allclose(np.asarray(g_comp), np.asarray(g_plain),
                               rtol=5e-5, atol=1e-8)


def test_compact_default_scene_with_sky_miss_kills():
    """Non-RR kill source: sky misses.  default compact_from=1 partitions
    after the primary bounce."""
    scene, cam = builtin.default_scene(), builtin.default_camera()
    cfg = RenderConfig(width=24, height=24, samples=1, max_bounces=4)
    a, b = _render_pair(cfg, scene, cam)
    np.testing.assert_allclose(b, a, rtol=2e-6, atol=2e-7)

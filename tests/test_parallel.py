"""Sharding tests on the 8-device virtual CPU mesh (SURVEY §4 item 4).

The key contract: an N-device row-sharded render is pixel-identical to the
1-device render of the same frame (global pixel seeds make shards
independent of the mesh shape).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import optax

from wc_path_tracer_tpu.models import builtin
from wc_path_tracer_tpu.parallel import mesh as pmesh
from wc_path_tracer_tpu.parallel import render as prender
from wc_path_tracer_tpu.render import golden
from wc_path_tracer_tpu.scene.camera import camera_matrices
from wc_path_tracer_tpu.utils.config import RenderConfig

CFG = RenderConfig(width=32, height=24, samples=1, max_bounces=2)


def test_mesh_has_8_devices():
    m = pmesh.make_mesh()
    assert m.devices.size == 8


def test_sharded_render_matches_single_device():
    scene, cam = builtin.default_scene(), builtin.default_camera()
    mats = camera_matrices(cam, CFG.width / CFG.height)
    mesh = pmesh.make_mesh()

    fn = prender.sharded_render_frame(mesh, CFG)
    sharded = np.asarray(fn(scene, mats, jnp.uint32(2)))

    # single-device oracle through the same jitted machinery on a 1-mesh
    mesh1 = pmesh.make_mesh(jax.devices()[:1])
    fn1 = prender.sharded_render_frame(mesh1, CFG)
    single = np.asarray(fn1(scene, mats, jnp.uint32(2)))

    np.testing.assert_array_equal(sharded, single)


def test_sharded_render_rows_cover_whole_image():
    scene, cam = builtin.default_scene(), builtin.default_camera()
    mats = camera_matrices(cam, CFG.width / CFG.height)
    mesh = pmesh.make_mesh()
    img = np.asarray(prender.sharded_render_frame(mesh, CFG)(
        scene, mats, jnp.uint32(0)))
    assert img.shape == (CFG.height, CFG.width, 3)
    # every band rendered (sky makes all rows nonzero in this scene)
    assert (img.reshape(8, -1).sum(axis=1) > 0).all()


def test_indivisible_height_raises():
    mesh = pmesh.make_mesh()
    try:
        prender.sharded_render_frame(mesh, CFG.replace(height=30))
        assert False, "expected ValueError"
    except ValueError as e:
        assert "divisible" in str(e)


def test_loss_grad_psum_matches_unsharded_grad():
    scene, cam = builtin.default_scene(), builtin.default_camera()
    cfg = RenderConfig(width=16, height=16, samples=1, max_bounces=1)
    mats = camera_matrices(cam, 1.0)
    target = jnp.zeros((16, 16, 3), jnp.float32)
    mesh = pmesh.make_mesh()

    trainable = ("albedo", "emission", "emission_strength", "roughness")
    fn = prender.sharded_scene_loss_grad(mesh, cfg, trainable)
    loss_sh, grads_sh = fn(scene, mats, jnp.uint32(0), target)

    # unsharded oracle
    def loss_fn(params):
        m = dataclasses.replace(scene.materials, **params)
        s = dataclasses.replace(scene, materials=m)
        img = golden.render_frame(s, mats, cfg, 0)
        return jnp.mean((img - target) ** 2)

    params = {k: getattr(scene.materials, k) for k in trainable}
    loss_ref, grads_ref = jax.value_and_grad(loss_fn)(params)

    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-5)
    for k in grads_ref:
        # one convention: sharded grads ARE mean-scaled (no npix fudge)
        np.testing.assert_allclose(
            np.asarray(grads_sh[k]), np.asarray(grads_ref[k]),
            rtol=2e-4, atol=1e-6)


def test_train_step_reduces_loss():
    scene, cam = builtin.default_scene(), builtin.default_camera()
    cfg = RenderConfig(width=16, height=16, samples=1, max_bounces=1)
    mats = camera_matrices(cam, 1.0)
    mesh = pmesh.make_mesh()

    # target: same scene with brighter emission
    target_scene = dataclasses.replace(
        scene, materials=dataclasses.replace(
            scene.materials,
            emission_strength=scene.materials.emission_strength * 3.0))
    target = golden.render_frame(target_scene, mats, cfg, 0)

    opt = optax.adam(0.2)
    trainable = ("emission_strength",)
    step = prender.make_train_step(mesh, cfg, opt, trainable)
    params = {k: getattr(scene.materials, k) for k in trainable}
    opt_state = opt.init(params)

    losses = []
    for i in range(25):
        scene, mats, opt_state, loss = step(scene, mats, opt_state,
                                            jnp.uint32(0), target)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.2, losses

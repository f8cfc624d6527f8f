"""Geometry/camera gradients + training checkpoint/resume.

VERDICT round-2 asks #3 and #7: trainables generalized beyond material
fields (sphere position/radius, mesh vertices, camera), finite-difference
agreement for interior parameters, an end-to-end recovery of a sphere
position, and kill-and-resume reproducing the uninterrupted loss curve.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wc_path_tracer_tpu.models import builtin
from wc_path_tracer_tpu.optim import params as reg
from wc_path_tracer_tpu.optim.inverse import (InverseRenderConfig,
                                              run_inverse_rendering)
from wc_path_tracer_tpu.parallel import mesh as pmesh
from wc_path_tracer_tpu.parallel import render as prender
from wc_path_tracer_tpu.render import golden
from wc_path_tracer_tpu.scene.camera import Camera, camera_matrices
from wc_path_tracer_tpu.scene.types import (MATERIAL_LAMBERTIAN,
                                            SceneBuilder)
from wc_path_tracer_tpu.utils.config import RenderConfig


def _simple_scene():
    """One lambertian sphere head-on + one emissive quad overhead: smooth
    shading, plenty of interior (non-silhouette) pixels."""
    b = SceneBuilder()
    m = b.add_material(MATERIAL_LAMBERTIAN, albedo=(0.6, 0.4, 0.3))
    lm = b.add_material(MATERIAL_LAMBERTIAN, emission=(1.0, 1.0, 1.0),
                        emission_strength=3.0)
    b.add_sphere((0.0, 0.0, -3.0), 1.0, m)
    quad = np.array([[-2, 3, -5], [2, 3, -5], [2, 3, -1],
                     [-2, 3, -5], [2, 3, -1], [-2, 3, -1]], np.float32)
    b.add_mesh(quad, np.arange(6, dtype=np.int32), tri_material=lm)
    return b.build(), Camera.create(position=(0.0, 0.0, 1.0))


# NEE on: with unidirectional transport only, a lambertian scene's radiance
# depends on geometry purely through *detached* hit/miss events (the
# detached-argmin estimator correctly returns zero there).  NEE's geometric
# term cos_surf*cos_light/d^2 is the continuous interior path that carries
# geometry/camera gradients.
CFG = RenderConfig(width=24, height=24, samples=1, max_bounces=2,
                   sky="black", use_nee=True)


def _loss_fn(trainable):
    scene, cam = _simple_scene()
    mats = camera_matrices(cam, 1.0)
    target = golden.render_frame(scene, mats, CFG, 0) * 0.5  # nonzero resid

    def img_fn(params):
        s, c = reg.apply_params(scene, cam, params)
        m = camera_matrices(c, 1.0)
        return golden.render_frame(s, m, CFG, 0)

    def loss(params):
        return jnp.mean((img_fn(params) - target) ** 2)

    return loss, img_fn, target, reg.get_params(scene, cam, trainable)


@pytest.mark.parametrize("trainable,eps,rtol", [
    (("sphere_position",), 3e-3, 0.12),
    (("sphere_radius",), 3e-3, 0.12),
    (("vertices",), 1e-3, 0.15),
    (("camera_position",), 3e-3, 0.12),
    (("camera_yaw",), 1e-2, 0.15),
    (("camera_fov",), 1e-2, 0.15),
])
def test_geometry_grads_match_finite_differences(trainable, eps, rtol):
    """Autodiff vs central differences projected onto a random direction.

    FD is taken at *image* level and contracted with the exact dL/dimg —
    loss-level central differences cancel catastrophically in f32 (the loss
    change is ~1e-5 of the loss).  Interior-parameter agreement only: the
    detached estimator carries no silhouette term, so tolerance is loose
    and the fixed-seed scene keeps silhouette pixels a small fraction.
    """
    loss, img_fn, target, params = _loss_fn(trainable)
    g = jax.grad(loss)(params)

    rng = np.random.default_rng(0)
    direction = {k: jnp.asarray(rng.normal(size=np.shape(v)), jnp.float32)
                 for k, v in params.items()}
    ad = sum(float(jnp.sum(g[k] * direction[k])) for k in params)

    def shift(sign):
        return {k: v + sign * eps * direction[k] for k, v in params.items()}

    img0 = img_fn(params)
    dldi = 2.0 * (img0 - target) / img0.size          # exact dL/dimg
    dimg = (img_fn(shift(+1)) - img_fn(shift(-1))) / (2 * eps)
    # interior-only comparison: pixels whose hit state flips under the
    # perturbation jump by O(1) radiance — that's the (unestimated)
    # silhouette boundary term, not the interior derivative under test
    interior = jnp.abs(dimg) * (2 * eps) < 0.05
    fd = float(jnp.sum(jnp.where(interior, dldi * dimg, 0.0)))
    ad_interior = ad  # autodiff carries no boundary term by construction
    assert np.isfinite(ad) and np.isfinite(fd)
    assert abs(ad_interior - fd) <= rtol * max(abs(fd), 1e-7), (ad, fd)


def test_invert_recovers_sphere_position():
    """End-to-end: recover a sphere position shifted by 0.25 units.

    Runs with cfg.edge_grads: position recovery is silhouette-dominated
    (interior-only gradients stall at ~60% of the initial error — measured
    round 4), and the coverage estimator supplies the boundary term that
    actually localizes the sphere.  Round-5 retune: fixing the bounce-0
    NEE shadow query (trace_rays_edge) restored the direct-light term to
    this scene's loss, which changed the landscape — lr 2e-2 now
    overshoots (err plateaus ~0.27); lr 1e-2 x 160 steps converges to
    err ~0.056 from 0.32."""
    cfg = CFG.replace(edge_grads=True)
    scene, cam = _simple_scene()
    mats = camera_matrices(cam, 1.0)
    target = golden.render_frame(scene, mats, cfg, 0)

    true_pos = np.asarray(scene.spheres.position)
    wrong = dataclasses.replace(scene, spheres=dataclasses.replace(
        scene.spheres,
        position=scene.spheres.position
        + jnp.asarray([[0.25, -0.2, 0.0], [0, 0, 0]], jnp.float32)[
            : scene.spheres.capacity]))

    inv = InverseRenderConfig(trainable=("sphere_position",),
                              learning_rate=1e-2, steps=160, vary_seed=False,
                              log_every=80)
    out, _, hist = run_inverse_rendering(wrong, cam, target, cfg, inv)
    err0 = np.linalg.norm(np.asarray(wrong.spheres.position)[0]
                          - true_pos[0])
    err1 = np.linalg.norm(np.asarray(out.spheres.position)[0] - true_pos[0])
    assert hist[-1]["loss"] < hist[0]["loss"] * 0.2, hist
    assert err1 < err0 / 3, (err0, err1)


@pytest.mark.parametrize("trainable,eps,rtol", [
    (("sphere_position",), 1e-3, 0.10),
    (("sphere_radius",), 1e-3, 0.05),
    (("camera_position",), 1e-3, 0.10),
])
def test_silhouette_boundary_term_matches_fd(trainable, eps, rtol):
    """Visibility/silhouette gradients (cfg.edge_grads, the coverage
    estimator — SURVEY §7.2 'reparameterized/edge-aware').

    Scene: a dark sphere silhouetted against a large emissive quad BEHIND
    it, so the loss depends on geometry almost purely through the
    silhouette.  With edge_grads the primal is continuous, so plain
    loss-level central differences (NO interior masking — the boundary
    term IS the signal) must match autodiff.  The residual tolerance
    covers coverage-ramp clip kinks crossed within +-eps."""
    b = SceneBuilder()
    m = b.add_material(MATERIAL_LAMBERTIAN, albedo=(0.2, 0.2, 0.2))
    lm = b.add_material(MATERIAL_LAMBERTIAN, emission=(1.0, 1.0, 1.0),
                        emission_strength=5.0)
    b.add_sphere((0.0, 0.0, -3.0), 1.0, m)
    quad = np.array([[-4, -4, -8], [4, -4, -8], [4, 4, -8],
                     [-4, -4, -8], [4, 4, -8], [-4, 4, -8]], np.float32)
    b.add_mesh(quad, np.arange(6, dtype=np.int32), tri_material=lm)
    scene, cam = b.build(), Camera.create(position=(0.0, 0.0, 1.0))

    cfg = RenderConfig(width=32, height=32, samples=1, max_bounces=1,
                       sky="black", edge_grads=True)
    mats = camera_matrices(cam, 1.0)
    target = golden.render_frame(scene, mats, cfg, 0) * 0.5

    def loss(params):
        s, c = reg.apply_params(scene, cam, params)
        return jnp.mean((golden.render_frame(s, camera_matrices(c, 1.0),
                                             cfg, 0) - target) ** 2)

    params = reg.get_params(scene, cam, trainable)
    g = jax.grad(loss)(params)
    rng = np.random.default_rng(0)
    direction = {k: jnp.asarray(rng.normal(size=np.shape(v)), jnp.float32)
                 for k, v in params.items()}
    ad = sum(float(jnp.sum(g[k] * direction[k])) for k in params)

    def shift(sign):
        return {k: v + sign * eps * direction[k] for k, v in params.items()}

    fd = float((loss(shift(+1)) - loss(shift(-1))) / (2 * eps))
    assert np.isfinite(ad) and np.isfinite(fd)
    assert abs(fd) > 1e-5          # the boundary term dominates by design
    assert abs(ad - fd) <= rtol * abs(fd), (ad, fd)


def test_sharded_geometry_grads_match_unsharded(tmp_path):
    """8-device dp grads for geometry params == single-device grads."""
    scene, cam = _simple_scene()
    target = golden.render_frame(scene, camera_matrices(cam, 1.0),
                                 CFG, 0) * 0.5
    trainable = ("sphere_position", "vertices", "camera_position")

    mesh8 = pmesh.make_mesh()
    lg8 = prender.sharded_scene_loss_grad(mesh8, CFG, trainable)
    loss8, g8 = lg8(scene, cam, jnp.uint32(0), target)

    loss_fn, _, _, params = _loss_fn(trainable)
    g1 = jax.grad(loss_fn)(params)
    for k in params:
        np.testing.assert_allclose(np.asarray(g8[k]), np.asarray(g1[k]),
                                   rtol=2e-4, atol=1e-7)


def test_invert_checkpoint_resume_reproduces_loss_curve(tmp_path):
    """Kill-and-resume: 12 steps straight == 6 steps + resume 6 steps."""
    scene, cam = _simple_scene()
    mats = camera_matrices(cam, 1.0)
    target = golden.render_frame(scene, mats, CFG, 0)
    wrong = dataclasses.replace(scene, materials=dataclasses.replace(
        scene.materials,
        emission_strength=scene.materials.emission_strength * 0.3))

    def cfg_for(steps):
        return InverseRenderConfig(trainable=("emission_strength",),
                                   learning_rate=5e-2, steps=steps,
                                   vary_seed=True, log_every=1)

    out_a, _, hist_a = run_inverse_rendering(wrong, cam, target, CFG,
                                             cfg_for(12))

    ck = str(tmp_path / "ck")
    run_inverse_rendering(wrong, cam, target, CFG, cfg_for(6),
                          checkpoint_dir=ck, checkpoint_every=3)
    out_b, _, hist_b = run_inverse_rendering(wrong, cam, target, CFG,
                                             cfg_for(12),
                                             checkpoint_dir=ck, resume=True)
    # resumed run continues at step 6 and lands on the same trajectory
    assert hist_b[0]["step"] == 6
    np.testing.assert_allclose(
        np.asarray(out_b.materials.emission_strength),
        np.asarray(out_a.materials.emission_strength), rtol=1e-6)
    full = {h["step"]: h["loss"] for h in hist_a}
    for h in hist_b:
        np.testing.assert_allclose(h["loss"], full[h["step"]], rtol=1e-5)


def test_unknown_trainable_rejected():
    with pytest.raises(ValueError, match="unknown trainable"):
        reg.validate(("albedo", "nope"))
    scene, cam = _simple_scene()
    with pytest.raises(ValueError, match="requires a scene.camera.Camera"):
        reg.get_params(scene, camera_matrices(cam, 1.0), ("camera_yaw",))


def test_mesh_silhouette_boundary_term_matches_fd():
    """VERDICT r4 ask #4 'Done' criterion (a): the boundary-term FD test
    with a MESH occluder.  A dark quad occludes an emissive quad behind it;
    with edge_grads the triangle coverage estimator makes the primal
    continuous in VERTEX positions, so loss-level central differences (no
    interior masking — the silhouette term IS the signal) must match
    autodiff."""
    b = SceneBuilder()
    m = b.add_material(MATERIAL_LAMBERTIAN, albedo=(0.2, 0.2, 0.2))
    lm = b.add_material(MATERIAL_LAMBERTIAN, emission=(1.0, 1.0, 1.0),
                        emission_strength=5.0)
    occ = np.array([[-1, -1, -3], [1, -1, -3], [1, 1, -3],
                    [-1, -1, -3], [1, 1, -3], [-1, 1, -3]], np.float32)
    b.add_mesh(occ, np.arange(6, dtype=np.int32), tri_material=m)
    quad = np.array([[-4, -4, -8], [4, -4, -8], [4, 4, -8],
                     [-4, -4, -8], [4, 4, -8], [-4, 4, -8]], np.float32)
    b.add_mesh(quad, np.arange(6, dtype=np.int32), tri_material=lm)
    scene, cam = b.build(), Camera.create(position=(0.0, 0.0, 1.0))

    cfg = RenderConfig(width=32, height=32, samples=1, max_bounces=1,
                       sky="black", edge_grads=True)
    mats = camera_matrices(cam, 1.0)
    target = golden.render_frame(scene, mats, cfg, 0) * 0.5

    def loss(params):
        s, c = reg.apply_params(scene, cam, params)
        return jnp.mean((golden.render_frame(s, camera_matrices(c, 1.0),
                                             cfg, 0) - target) ** 2)

    trainable = ("vertices",)
    eps, rtol = 1e-3, 0.10
    params = reg.get_params(scene, cam, trainable)
    g = jax.grad(loss)(params)
    rng = np.random.default_rng(0)
    direction = {k: jnp.asarray(rng.normal(size=np.shape(v)), jnp.float32)
                 for k, v in params.items()}
    ad = sum(float(jnp.sum(g[k] * direction[k])) for k in params)

    def shift(sign):
        return {k: v + sign * eps * direction[k] for k, v in params.items()}

    fd = float((loss(shift(+1)) - loss(shift(-1))) / (2 * eps))
    assert np.isfinite(ad) and np.isfinite(fd)
    assert abs(fd) > 1e-5          # the boundary term dominates by design
    assert abs(ad - fd) <= rtol * abs(fd), (ad, fd)


def test_tri_edge_sweep_matches_brute():
    """The cluster-sweep silhouette query (VERDICT r4 ask #4a) agrees with
    the brute backend on a real mesh: same winners, same attached t, same
    coverage alpha."""
    from wc_path_tracer_tpu.models.procedural import bunny_like_scene
    from wc_path_tracer_tpu.render import sweep
    from wc_path_tracer_tpu.scene.camera import primary_ray_directions

    scene, cam = bunny_like_scene(2)
    mats = camera_matrices(cam, 1.0)
    W = H = 24
    origin = jnp.broadcast_to(mats.position, (W * H, 3))
    dirs = primary_ray_directions(mats, W, H).reshape(-1, 3)
    cfg = RenderConfig(width=W, height=H, edge_grads=True)
    pix_ang = 2.0 * mats.inverse_projection[1, 1] / H

    cb = golden.tri_edge_candidate_brute(scene, origin, dirs, cfg, pix_ang)
    cs = sweep.tri_edge_candidate_sweep(scene, origin, dirs, cfg, pix_ang)
    np.testing.assert_array_equal(np.asarray(cb["found"]),
                                  np.asarray(cs["found"]))
    f = np.asarray(cb["found"])
    np.testing.assert_allclose(np.asarray(cs["t_w"])[f],
                               np.asarray(cb["t_w"])[f], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(cs["alpha"])[f],
                               np.asarray(cb["alpha"])[f],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(cs["material"])[f],
                                  np.asarray(cb["material"])[f])


def test_mesh_vertex_inversion_moves_silhouette_sweep():
    """VERDICT r4 ask #4 'Done' criterion (b): a vertex inversion that
    moves a silhouette on a >=1k-triangle mesh via the SWEEP backend.

    A dark 1280-tri mesh against a bright sky, primary rays only: interior
    pixels carry ZERO vertex gradient (flat radiance), so any recovery is
    purely the silhouette boundary term supplied by the triangle coverage
    estimator through the cluster-sweep widened query.  The optimized
    parameter is a global mesh translation applied through the vertex
    array (the gradient is the psum of every silhouette vertex's coverage
    gradient — interior vertices contribute exactly zero)."""
    import optax
    from wc_path_tracer_tpu.models.procedural import icosphere
    from wc_path_tracer_tpu.render import sweep
    from wc_path_tracer_tpu.scene.types import SceneBuilder

    v, i = icosphere(3, radius=1.0)             # 1280 tris >= 1k
    assert len(i) // 3 >= 1000
    b = SceneBuilder()
    m = b.add_material(MATERIAL_LAMBERTIAN, albedo=(0.02, 0.02, 0.02))
    b.add_mesh(v, i, tri_material=m)
    scene = b.build()
    cam = Camera.create(position=(0.0, 0.0, 3.0))
    cfg = RenderConfig(width=32, height=32, samples=1, max_bounces=0,
                       sky="gradient", edge_grads=True)
    mats = camera_matrices(cam, 1.0)

    target = sweep.render_frame(scene, mats, cfg, 0)
    true_shift = jnp.asarray([0.12, -0.08], jnp.float32)   # in-plane (x, y):
    # depth (z) is only weakly constrained by a silhouette and drifts

    def loss_fn(offset):
        off3 = jnp.concatenate([true_shift + offset, jnp.zeros(1)])
        s = dataclasses.replace(scene, mesh=dataclasses.replace(
            scene.mesh, vertices=scene.mesh.vertices + off3))
        img = sweep.render_frame(s, mats, cfg, 0)
        return jnp.mean((img - target) ** 2)

    vg = jax.jit(jax.value_and_grad(loss_fn))
    opt = optax.adam(1e-2)
    offset = jnp.zeros(2, jnp.float32)
    state = opt.init(offset)
    losses = []
    for _ in range(120):
        l, g = vg(offset)
        losses.append(float(l))
        up, state = opt.update(g, state, offset)
        offset = optax.apply_updates(offset, up)
    err0 = float(jnp.linalg.norm(true_shift))
    err1 = float(jnp.linalg.norm(true_shift + offset))
    assert losses[-1] < losses[0] * 0.5, losses[:3] + losses[-3:]
    assert err1 < err0 / 3, (err0, err1, losses[:3] + losses[-3:])


def test_shadow_silhouette_grads_match_fd():
    """Secondary-bounce (shadow) visibility gradients: with edge_grads, an
    occluder sphere OUT OF VIEW that affects the image only through its
    NEE shadow must carry a finite-difference-matching position gradient
    (golden._soft_sphere_shadow — the penumbra coverage ramp; without it
    the boolean shadow gate has exactly zero gradient)."""
    b = SceneBuilder()
    floor = b.add_material(MATERIAL_LAMBERTIAN, albedo=(0.7, 0.7, 0.7))
    lm = b.add_material(MATERIAL_LAMBERTIAN, emission=(1.0, 1.0, 1.0),
                        emission_strength=8.0)
    occ = b.add_material(MATERIAL_LAMBERTIAN, albedo=(0.1, 0.1, 0.1))
    # floor quad at y=0, light quad at y=4 (both face each other);
    # occluder sphere between them at y=2, outside the camera frustum's
    # direct view of the light (camera looks down at the floor)
    quad = np.array([[-3, 0, -7], [3, 0, -7], [3, 0, -1],
                     [-3, 0, -7], [3, 0, -1], [-3, 0, -1]], np.float32)
    b.add_mesh(quad, np.arange(6, dtype=np.int32), tri_material=floor)
    lq = np.array([[-1, 4, -5], [1, 4, -5], [1, 4, -3],
                   [-1, 4, -5], [1, 4, -3], [-1, 4, -3]], np.float32)
    b.add_mesh(lq, np.arange(6, dtype=np.int32), tri_material=lm)
    b.add_sphere((0.0, 2.0, -4.0), 0.6, occ)
    scene = b.build()
    cam = Camera.create(position=(0.0, 1.5, 0.5), pitch=-35.0)

    # max_bounces=0 -> ONE segment: light transport is purely the NEE
    # direct term, so the loss depends on the occluder ONLY through the
    # (now soft) shadow.  With more bounces the BSDF-sampled emission path
    # adds a HARD visibility term the estimator does not smooth
    # (documented scope).
    cfg = RenderConfig(width=32, height=32, samples=1, max_bounces=0,
                       sky="black", use_nee=True, edge_grads=True)
    mats = camera_matrices(cam, 1.0)
    target = golden.render_frame(scene, mats, cfg, 0) * 0.5

    def loss(params):
        s, c = reg.apply_params(scene, cam, params)
        return jnp.mean((golden.render_frame(s, camera_matrices(c, 1.0),
                                             cfg, 0) - target) ** 2)

    trainable = ("sphere_position",)
    eps, rtol = 2e-3, 0.15
    params = reg.get_params(scene, cam, trainable)
    g = jax.grad(loss)(params)
    rng = np.random.default_rng(1)
    direction = {k: jnp.asarray(rng.normal(size=np.shape(v)), jnp.float32)
                 for k, v in params.items()}
    ad = sum(float(jnp.sum(g[k] * direction[k])) for k in params)

    def shift(sign):
        return {k: v + sign * eps * direction[k] for k, v in params.items()}

    fd = float((loss(shift(+1)) - loss(shift(-1))) / (2 * eps))
    assert np.isfinite(ad) and np.isfinite(fd)
    assert abs(fd) > 1e-6          # the shadow boundary term is the signal
    assert abs(ad - fd) <= rtol * abs(fd), (ad, fd)


def test_edge_grads_nee_primal_consistent():
    """Regression guard for the round-5 bounce-0 NEE shadow fix: the
    edge_grads estimator must track the hard estimator's brightness on an
    NEE-lit scene (the latent round-4 bug shadowed every surface with its
    own primary hit — a 4x frame darkening)."""
    b = SceneBuilder()
    floor = b.add_material(MATERIAL_LAMBERTIAN, albedo=(0.7, 0.7, 0.7))
    lm = b.add_material(MATERIAL_LAMBERTIAN, emission=(1.0, 1.0, 1.0),
                        emission_strength=8.0)
    occ = b.add_material(MATERIAL_LAMBERTIAN, albedo=(0.2, 0.2, 0.6))
    quad = np.array([[-3, 0, -7], [3, 0, -7], [3, 0, -1],
                     [-3, 0, -7], [3, 0, -1], [-3, 0, -1]], np.float32)
    b.add_mesh(quad, np.arange(6, dtype=np.int32), tri_material=floor)
    lq = np.array([[-1, 4, -5], [1, 4, -5], [1, 4, -3],
                   [-1, 4, -5], [1, 4, -3], [-1, 4, -3]], np.float32)
    b.add_mesh(lq, np.arange(6, dtype=np.int32), tri_material=lm)
    b.add_sphere((0.0, 1.2, -4.0), 0.5, occ)
    scene = b.build()
    cam = Camera.create(position=(0.0, 2.0, 0.0), pitch=-30.0)
    mats = camera_matrices(cam, 1.0)
    cfg = RenderConfig(width=48, height=48, samples=1, max_bounces=1,
                       sky="black", use_nee=True)

    def avg(c):
        acc = 0
        for f in range(6):
            acc = acc + golden.render_frame(scene, mats, c, f)
        return float(jnp.mean(acc / 6))

    hard = avg(cfg)
    soft = avg(cfg.replace(edge_grads=True))
    assert hard > 0.02          # the scene is actually lit
    # penumbra smoothing + edge antialiasing shift the mean by a few
    # percent at most; the round-4 bug produced soft ~= hard / 4
    assert abs(soft - hard) < 0.12 * hard, (hard, soft)

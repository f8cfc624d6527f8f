"""Multi-process (multi-host analog) integration: jax.distributed + gloo.

VERDICT round-2 ask #6: a real 2-process ``jax.distributed.initialize``
test.  Two spawned processes each own 2 virtual CPU devices, form one
global 4-device dp mesh, render dp-sharded, and all-reduce gradients across
the process boundary (the DCN analog).  Asserts: both processes see the
same replicated results, and those results are pixel/grad-identical to a
single-process 4-device run of the same program (global pixel seeds,
render/golden.py render_rows).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "tools", "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def multihost_outputs(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mh")
    coord = f"localhost:{_free_port()}"
    outs = [str(tmp / f"p{i}") for i in range(2)]
    procs = [subprocess.Popen(
        [sys.executable, WORKER, coord, "2", str(i), "2", outs[i]],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
        for i in range(2)]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=280)
        logs.append(out.decode())
    if any(p.returncode != 0 for p in procs):
        pytest.fail("worker failed:\n" + "\n----\n".join(logs))
    return [np.load(o + ".npz") for o in outs]


def test_two_process_results_agree(multihost_outputs):
    a, b = multihost_outputs
    np.testing.assert_array_equal(a["img"], b["img"])
    np.testing.assert_array_equal(a["loss"], b["loss"])
    np.testing.assert_array_equal(a["g_albedo"], b["g_albedo"])


def test_two_process_matches_single_process(multihost_outputs):
    import jax
    import jax.numpy as jnp
    from wc_path_tracer_tpu.models import builtin
    from wc_path_tracer_tpu.parallel import mesh as pmesh
    from wc_path_tracer_tpu.parallel import render as prender
    from wc_path_tracer_tpu.scene.camera import camera_matrices
    from wc_path_tracer_tpu.utils.config import RenderConfig

    mesh = pmesh.make_mesh(jax.devices()[:4])
    cfg = RenderConfig(width=16, height=32, samples=1, max_bounces=2,
                       sky="black")
    scene, cam = builtin.cornell_box_scene()
    scene = pmesh.replicate_scene(scene, mesh)
    mats = camera_matrices(cam, cfg.width / cfg.height)
    img = np.asarray(prender.sharded_render_frame(mesh, cfg)(
        scene, mats, jnp.uint32(1)))

    loss_grad = prender.sharded_scene_loss_grad(
        mesh, cfg, ("albedo", "sphere_position"))
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    loss, grads = loss_grad(scene, cam, jnp.uint32(1), target)

    a = multihost_outputs[0]
    np.testing.assert_array_equal(a["img"], img)
    np.testing.assert_allclose(a["loss"], np.asarray(loss), rtol=1e-6)
    np.testing.assert_allclose(a["g_albedo"], np.asarray(grads["albedo"]),
                               rtol=1e-5, atol=1e-8)

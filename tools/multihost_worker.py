"""One process of a multi-process (multi-host-style) render job.

Spawned N times by tests/test_multihost.py (and usable manually):

    python tools/multihost_worker.py <coordinator> <num_procs> <proc_id> \
        <local_devices> <out.npy>

Each process owns ``local_devices`` virtual CPU devices; together they form
one global dp mesh.  The process renders the full frame dp-sharded, then
all-gathers it and writes its local view of the global image plus the
gradient pytree to ``out.npy`` — the test asserts bitwise identity across
processes AND against the single-process render (global pixel seeds make
the sharded render pixel-identical, render/golden.py render_rows).

This is the 2-host analog of a TPU pod job: jax.distributed.initialize over
a coordinator, cross-process collectives (gloo on CPU, ICI/DCN on TPU),
scene replicated, rays sharded.
"""

import sys

import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def main():
    coord, nproc, pid, local, out = sys.argv[1:6]
    nproc, pid, local = int(nproc), int(pid), int(local)

    import os
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_force_host_platform_device_count={local}").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from wc_path_tracer_tpu.parallel.mesh import initialize_distributed
    initialize_distributed(coordinator_address=coord, num_processes=nproc,
                           process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == nproc * local, jax.devices()

    import numpy as np
    import jax.numpy as jnp
    from wc_path_tracer_tpu.models import builtin
    from wc_path_tracer_tpu.parallel import mesh as pmesh
    from wc_path_tracer_tpu.parallel import render as prender
    from wc_path_tracer_tpu.scene.camera import camera_matrices
    from wc_path_tracer_tpu.utils.config import RenderConfig

    mesh = pmesh.make_mesh()      # global mesh over all processes' devices
    n_dev = nproc * local
    cfg = RenderConfig(width=16, height=8 * n_dev, samples=1, max_bounces=2,
                       sky="black")
    scene, cam = builtin.cornell_box_scene()
    scene = pmesh.replicate_scene(scene, mesh)
    mats = camera_matrices(cam, cfg.width / cfg.height)

    img = prender.sharded_render_frame(mesh, cfg)(scene, mats, jnp.uint32(1))
    # gather the global image to every process for comparison
    from jax.sharding import NamedSharding, PartitionSpec as P
    img_rep = jax.jit(lambda x: x,
                      out_shardings=NamedSharding(mesh, P()))(img)
    # replicated -> every process holds the full image locally
    img_np = np.asarray(img_rep.addressable_shards[0].data)

    # gradient all-reduce across processes (psum over dp spans DCN here)
    loss_grad = prender.sharded_scene_loss_grad(
        mesh, cfg, ("albedo", "sphere_position"))
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    loss, grads = loss_grad(scene, cam, jnp.uint32(1), target)
    loss_rep = jax.jit(lambda x: x,
                       out_shardings=NamedSharding(mesh, P()))(loss)
    g_alb = jax.jit(lambda x: x, out_shardings=NamedSharding(mesh, P()))(
        grads["albedo"])

    np.savez(out, img=img_np, loss=np.asarray(loss_rep),
             g_albedo=np.asarray(g_alb))
    print(f"proc {pid}/{nproc}: devices={jax.device_count()} "
          f"loss={float(loss_rep):.6f} OK", flush=True)


if __name__ == "__main__":
    main()

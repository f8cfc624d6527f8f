"""Isolate cluster-sweep stage costs on the live TPU."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

from wc_path_tracer_tpu.models.procedural import bunny_like_scene
from wc_path_tracer_tpu.kernels import cluster
from wc_path_tracer_tpu.ops import intersect as ix
from wc_path_tracer_tpu.scene.camera import camera_matrices, primary_ray_directions

F32 = np.float32


def bench(fn, K, *args):
    @jax.jit
    def run(*args):
        def body(acc, i):
            return acc + fn(acc, *args), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K, dtype=jnp.uint32))
        return acc
    t0 = time.perf_counter()
    float(run(*args))
    compile_s = time.perf_counter() - t0
    best = 1e30
    for _ in range(2):
        t0 = time.perf_counter()
        float(run(*args))
        best = min(best, time.perf_counter() - t0)
    return best / K, compile_s


def main():
    subdiv = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    scene, cam = bunny_like_scene(subdiv)
    mats = camera_matrices(cam, 1.0)
    R = size * size
    dirs = primary_ray_directions(mats, size, size).reshape(-1, 3)
    o = jnp.broadcast_to(mats.position, (R, 3)) + dirs * F32(0)
    tinit = jnp.full((R,), ix.KINFINITY, jnp.float32)
    print(f"tris={scene.mesh.triangle_capacity} R={R}", file=sys.stderr)

    # stage 1: table build only
    def f_tables(acc, mesh):
        tris, cmin, cmax = cluster.build_cluster_tables(mesh)
        return jnp.sum(cmin * 0) + jnp.sum(tris[:1, :1]) + acc * 0
    dt, cs = bench(f_tables, 5, scene.mesh)
    print(f"tables:  {dt*1e3:8.2f} ms (compile {cs:.0f}s)")

    tris, cmin, cmax = jax.jit(cluster.build_cluster_tables)(scene.mesh)

    # stage 2: cull sweep only
    def f_cull(acc, o, d, tinit, cmin, cmax):
        inv_d = F32(1.0) / d
        t0, t1 = ix.ray_box_sweep(o, inv_d, cmin, cmax)
        enter = (t0 <= t1) & (t1 >= F32(0.0)) & (t0 < tinit[:, None])
        return jnp.sum(enter.astype(jnp.float32)) + acc * 0
    dt, cs = bench(f_cull, 5, o, dirs, tinit, cmin, cmax)
    print(f"cull:    {dt*1e3:8.2f} ms (compile {cs:.0f}s)")

    # stage 3: full cluster_sweep (tables prebuilt as args)
    def f_sweep(acc, o, d, tinit, tris, cmin, cmax):
        pay = cluster.cluster_sweep(o, d + acc * 0, tinit, tris, cmin, cmax,
                                    interpret=False)
        return jnp.sum(pay[:, 0] * 0) + jnp.sum(pay[:, 11])
    dt, cs = bench(f_sweep, 5, o, dirs, tinit, tris, cmin, cmax)
    print(f"sweep:   {dt*1e3:8.2f} ms (compile {cs:.0f}s)  "
          f"{R/dt/1e6:.0f} Mrays/s closest-hit")


if __name__ == "__main__":
    main()

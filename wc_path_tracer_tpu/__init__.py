"""wc_path_tracer_tpu — a TPU-native differentiable path-tracing framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
renderer myri4/WC-Path-tracer (a Jai/Vulkan interactive path-tracing editor,
see /root/reference):

- progressive Monte-Carlo path tracing of spheres + BVH triangle meshes
  (reference kernel: src/shaders/pathTracer.comp)
- metal / dielectric BSDFs with full unpolarized Fresnel, TIR and
  Beer-Lambert absorption (pathTracer.comp:213-284), extended with
  Lambertian + rough-GGX lobes, next-event estimation and Russian roulette
- bit-exact PCG PRNG (src/shaders/include/Random.glsl)
- OBJ loading + median-split BVH build (src/ModelLoader.jai,
  src/PathTracingRenderer.jai:142-270)
- progressive accumulation with reset-on-edit (pathTracer.comp:314-318,
  src/editor.jai:149-152)

re-architected TPU-first:

- wavefront (megakernel-free) ray batching over ``(8,128)`` lanes instead of
  a per-pixel GPU megakernel
- Pallas kernels for the traversal/shading hot path
- ``jax.sharding.Mesh`` + ``shard_map`` data-parallel ray sharding with
  ``psum`` gradient all-reduce instead of single-GPU Vulkan dispatch
- everything differentiable end-to-end for inverse rendering
"""

__version__ = "0.1.0"

from wc_path_tracer_tpu.utils.config import RenderConfig  # noqa: F401

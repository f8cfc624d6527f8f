"""Render configuration.

The reference has no config system beyond hardcoded struct defaults and a
reflection-driven property editor (reference: src/PathTracingRenderer.jai:119-120
``samples=1, maxBounceCount=3``; src/ui_utils.jai:46-194 annotation-driven
editing).  Here every editable knob is a field of a frozen dataclass so it can
be a *static* jit argument: shapes (width/height/samples/bounces) must be
known at trace time on TPU.

Fields that change per-frame without recompilation (camera, material values,
frame counter) live in the Scene / Camera pytrees instead.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static render parameters (hashable -> usable as a jit static arg).

    Defaults reproduce the reference's semantics exactly
    (src/PathTracingRenderer.jai:119-120, src/shaders/pathTracer.comp).
    """

    width: int = 256
    height: int = 256
    samples: int = 1           # ref default: samples=1 (PathTracingRenderer.jai:119)
    max_bounces: int = 3       # ref default: maxBounceCount=3 (:120). NOTE the ref
    #                            bounce loop runs max_bounces+1 segments
    #                            (pathTracer.comp:245 `i <= maxBounceCount`); we
    #                            reproduce that: number of path segments = max_bounces+1.

    # --- extensions beyond the reference (all off by default = ref semantics) ---
    pixel_jitter: bool = False   # ref never jitters the primary ray (quirk 5,
    #                              pathTracer.comp:309-310): AA only emerges across
    #                              accumulated frames. True = stratified subpixel jitter.
    use_nee: bool = False        # next-event estimation (not in ref; BASELINE north star)
    mis: bool = True             # balance-heuristic MIS between light and BSDF
    #                              sampling (lambert + GGX lobes; metal/dielectric
    #                              are delta lobes -> BSDF-only). False restores
    #                              the round-1 estimator (lambert-only NEE with
    #                              emission skipped after an NEE bounce).
    use_rr: bool = False         # Russian roulette termination (not in ref)
    rr_start_bounce: int = 3     # first bounce index eligible for RR termination
    sky: str = "gradient"        # "gradient" = ref's vertical mix (pathTracer.comp:236-239),
    #                              "black" = no environment light (Cornell-style)
    tonemap: str = "none"        # one of ops.tonemap.TONEMAPS; ref computes raw linear HDR
    #                              (tonemap calls commented out, pathTracer.comp:320-321)
    gamma: float = 1.0           # output gamma (1.0 = ref's raw linear output)
    bloom: bool = False          # bloom pyramid post pass (bloom.comp is compiled
    #                              but never dispatched in the ref, quirk §2.4(9) —
    #                              here it is live and off by default)
    bloom_threshold: float = 1.0  # prefilter threshold (bloom.comp Params.x)
    bloom_knee: float = 0.1       # soft-knee width (curve = thr-knee, 2k, .25/k)
    bloom_strength: float = 1.0   # scale on the added bloom (1.0 = composite.comp's
    #                               direct add; extension knob beyond the ref)

    edge_grads: bool = False     # silhouette/visibility gradients via the
    #                              coverage (smoothed-primal) estimator:
    #                              primary rays accept sphere hits within
    #                              half a pixel of the silhouette AND
    #                              miter-widened triangle hits near
    #                              adjacency-classified silhouette edges
    #                              (golden.intersect_primary_edge /
    #                              tri_edge_candidate_*), blending hit and
    #                              per-ray loser-candidate paths by the
    #                              analytic coverage; NEE shadow rays get
    #                              soft sphere-occluder penumbra ramps
    #                              (golden._soft_sphere_shadow) — the
    #                              image becomes continuous in geometry and
    #                              camera parameters, so autodiff carries
    #                              the boundary terms. ~2x forward cost;
    #                              off = reference step-function visibility
    #                              (zero silhouette gradient).

    compact: bool = False        # alive-ray stream compaction between bounces
    #                              (golden.trace_rays_compact): bit-identical
    #                              output, skips intersect+BSDF work for dead
    #                              lanes in blocks — pays off with RR / deep
    #                              bounce counts where most lanes die early.
    compact_blocks: int = 16     # block grid for compaction: work is skipped
    #                              in units of num_rays/compact_blocks lanes.
    compact_from: int | None = None  # bounce index of the one-time partition;
    #                              earlier bounces run dense (zero overhead).
    #                              None (default) tracks the kill sources:
    #                              rr_start_bounce + 1 with RR, else 1 (the
    #                              round-2 fixed default of 4 exceeded the
    #                              default bounce count, silently disabling
    #                              compaction).

    @property
    def row_chunks_resolved(self) -> int:
        if self.row_chunks:
            return self.row_chunks
        # measured: 16 chunks edge out 8 at 1024^2 (129.9 vs 128.0
        # Mrays/s fwd+bwd); below 1024 rows, 8 keeps bands >= 64 rows
        if self.height >= 1024 and self.height % 16 == 0:
            return 16
        return 8 if (self.height >= 512 and self.height % 8 == 0) else 1

    @property
    def compact_from_resolved(self) -> int:
        if self.compact_from is not None:
            return self.compact_from
        return self.rr_start_bounce + 1 if self.use_rr else 1

    ray_sort: str = "dynamic"    # ray regrouping before the cluster sweep
    #                              (sweep renderer only): "dynamic"
    #                              (default) = per-bounce Morton sort
    #                              (aliveness bit, direction octant,
    #                              quantized origin) so every 512-ray
    #                              kernel block sees a tight frustum and
    #                              terminated rays form all-dead blocks
    #                              the kernel skips — measured 3-4x on the
    #                              kernel stage for incoherent bounce
    #                              wavefronts, +22% end-to-end on the
    #                              bunny bench (BASELINE.md round 4);
    #                              "static" = fixed pixel-tile permutation
    #                              (reshape-only, free) applied to every
    #                              query — it mainly helps coherent
    #                              primary rays, later bounces keep the
    #                              permutation but little of the benefit;
    #                              "off" = none.  All three produce
    #                              identical images except on exact
    #                              cross-cluster f32 t-ties (measure
    #                              zero; see kernels/cluster.py
    #                              _sweep_kernel tie note).

    row_chunks: int = 0          # render the frame as this many row bands
    #                              vmapped into one batched dispatch
    #                              (golden.render_frame).  BIT-IDENTICAL
    #                              output (pixel seeds are global), but
    #                              measured up to ~1.3x faster fwd+bwd at
    #                              1024^2: a (8, 131072)-ray organization
    #                              outruns one flat (1048576,)-ray graph
    #                              on this hardware (BASELINE.md round 5).
    #                              0 = auto (8 when height is divisible
    #                              and >= 512); 1 = off.

    cluster_kernel: str = "mt"   # cluster-sweep triangle-test kernel:
    #                              "mt" = Moller-Trumbore on the VPU
    #                              (bit-faithful to the brute oracle);
    #                              "mxu" = plane-form variant whose six
    #                              per-(ray,triangle) dot products ride one
    #                              MXU matmul per cluster visit
    #                              (kernels/cluster.py
    #                              mxu_tables_from_coords) — agrees with
    #                              "mt" to f32 roundoff, not bitwise.
    #                              Measured tradeoff: BASELINE.md round 5.

    ray_block: int = 0           # cluster-sweep rays per kernel grid step
    #                              (0 = kernels/cluster.py default).  Under
    #                              dynamic ray sorting, smaller blocks span
    #                              tighter frusta (fewer active clusters
    #                              per block) at the cost of more grid
    #                              steps; the round-5 SMEM-slice active
    #                              lists removed the old 512 floor.
    #                              Measured tradeoff: BASELINE.md round 5.

    traversal: str = "stackless"  # BVH walk flavor: "stackless" = escape-link
    #                               DFS (one i32 cursor per lane, cheapest
    #                               iteration on the VPU); "stack" = per-lane
    #                               32-deep stack with near-child-first order,
    #                               the reference's exact visit order
    #                               (pathTracer.comp:151-201).

    # --- compat quirks (True = reproduce reference behavior bit-for-bit) ---
    sphere_near_root_only: bool = True  # quirk 1: ref tests only the near root `.x`
    #                                     of raySphereIntersect (pathTracer.comp:141-142),
    #                                     so rays starting inside a sphere never hit it.
    #                                     False = also accept the far root (correct glass).

    def __post_init__(self):
        if self.width <= 0 or self.height <= 0:
            raise ValueError("width/height must be positive")
        if self.samples <= 0:
            raise ValueError("samples must be positive")
        if self.max_bounces < 0:
            raise ValueError("max_bounces must be >= 0")
        if self.sky not in ("gradient", "black"):
            raise ValueError(f"unknown sky model: {self.sky!r}")
        if self.ray_sort not in ("static", "dynamic", "off"):
            raise ValueError(f"unknown ray_sort: {self.ray_sort!r}")
        if self.ray_block and (self.ray_block < 8
                               or self.ray_block & (self.ray_block - 1)):
            raise ValueError("ray_block must be 0 or a power of two >= 8")
        if self.cluster_kernel not in ("mt", "mxu"):
            raise ValueError(f"unknown cluster_kernel: {self.cluster_kernel!r}")
        if self.row_chunks < 0:
            raise ValueError("row_chunks must be >= 0")
        if self.row_chunks > 1 and self.height % self.row_chunks:
            raise ValueError(
                f"height {self.height} not divisible by row_chunks "
                f"{self.row_chunks}")
        if self.traversal not in ("stackless", "stack"):
            raise ValueError(f"unknown traversal: {self.traversal!r}")
        if self.compact_blocks <= 0:
            raise ValueError("compact_blocks must be positive")
        if self.edge_grads and self.pixel_jitter:
            raise ValueError(
                "edge_grads antialiases silhouettes analytically; combine "
                "with pixel_jitter is unsupported")

    @property
    def num_rays(self) -> int:
        return self.width * self.height

    def replace(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)

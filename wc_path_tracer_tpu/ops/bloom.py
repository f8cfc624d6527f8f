"""Bloom pyramid + composite pass (TPU-native, fully vectorized).

The reference ships ``src/shaders/bloom.comp`` (quadratic-threshold prefilter,
13-tap box downsample chain, tent-9 upsample chain) and
``src/shaders/composite.comp`` (screen + bloom add, gamma, PBR-neutral
tonemap), compiled by the build script (src/build.jai:48) but **never
dispatched** — no pipeline or host orchestration exists for them (SURVEY
§2.4(9)).  Here the capability is live: the same filters, expressed as fixed
strided stencils instead of per-pixel ``textureLod`` sampling, so XLA fuses
the whole pyramid into a handful of elementwise/pad/slice ops — no gathers.

Faithfulness notes (all derived from the shader math, bilinear sampling
semantics included):

* ``DownsampleBox13`` (bloom.comp:26-66) samples at the *corner* between the
  2x2 source block plus offsets of +-0.5 and +-1 source texels.  Bilinear
  samples at texel corners are exact 2x2 averages; samples at +-0.5 land on
  texel centers.  The whole filter therefore reduces to a fixed 4x4
  texel-level stencil with stride 2, which is what `downsample_box13` applies.
* The shader has two duplicated taps: ``J`` re-samples ``I``'s location
  (+2,+2) and ``L`` re-samples ``F``'s (-2,-2) (bloom.comp:43-45), making the
  kernel asymmetric (corner (+1,+1) weighs 0.375, (-1,-1) weighs 0.25,
  (0,+1) weighs 0.125 vs (0,-1) 0.25).  Reproduced exactly.
* ``UpsampleTent9`` (bloom.comp:91-109) = 9 bilinear taps at integer texel
  offsets with tent weights.  Bilinearity is linear in the image, so it
  equals a single bilinear sample of the image convolved with the 3x3 tent
  kernel [1,2,1]^T[1,2,1]/16 — implemented that way (`_tent3`, then exact
  2x bilinear upsample with 0.75/0.25 weights for the half-texel phase).
* ``QuadraticThreshold``/``Prefilter`` (bloom.comp:68-86): clamp at 20, then
  soft knee curve = (threshold - knee, 2*knee, 0.25/knee).
* ``composite.comp:35-55`` order is quirky: bloom add, THEN pow(1/2.2) gamma,
  THEN PBR-neutral tonemap.  `composite` reproduces that order.
* Edge behavior: the reference never creates a sampler for these shaders
  (they are never dispatched), so the address mode is unobservable; we use
  clamp-to-edge, the GL default.

Everything is differentiable jnp; safe inside jit.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from wc_path_tracer_tpu.ops import tonemap as tm

F32 = np.float32


def _pad_edge(img, top, bottom, left, right):
    return jnp.pad(img, ((top, bottom), (left, right), (0, 0)), mode="edge")


def quadratic_threshold(color, threshold: float, knee: float):
    """Soft-knee brightness threshold (bloom.comp:68-79)."""
    curve_x = F32(threshold - knee)
    curve_y = F32(2.0 * knee)
    curve_z = F32(0.25 / max(knee, 1e-5))
    brightness = jnp.max(color, axis=-1, keepdims=True)
    rq = jnp.clip(brightness - curve_x, F32(0.0), curve_y)
    rq = rq * rq * curve_z
    scale = jnp.maximum(rq, brightness - F32(threshold)) / jnp.maximum(
        brightness, F32(1e-4))
    return color * scale


def prefilter(color, threshold: float = 1.0, knee: float = 0.1):
    """Clamp + quadratic threshold (bloom.comp:81-86; clampValue = 20)."""
    return quadratic_threshold(jnp.minimum(color, F32(20.0)), threshold, knee)


def downsample_box13(img):
    """13-tap box downsample by 2x (bloom.comp:26-66), as a 4x4/stride-2
    texel stencil.  Odd inputs are edge-padded to even first (each output
    texel's uv still lands on the corner of its 2x2 source block)."""
    h, w, _ = img.shape
    if h % 2 or w % 2:
        img = _pad_edge(img, 0, h % 2, 0, w % 2)
        h, w = img.shape[0], img.shape[1]
    # padded so offsets -1..+2 around each 2x2 block origin are in range
    p = _pad_edge(img, 1, 2, 1, 2)

    def s(dy, dx):  # texel at block origin + (dy, dx), strided over blocks
        return p[1 + dy:1 + dy + h:2, 1 + dx:1 + dx + w:2]

    def corner(dy, dx):  # bilinear sample at a texel corner = 2x2 average
        return (s(dy - 1, dx - 1) + s(dy - 1, dx) +
                s(dy, dx - 1) + s(dy, dx)) * F32(0.25)

    # center taps at +-0.5 land exactly on texel centers (direct reads)
    inner = s(0, 0) + s(0, 1) + s(1, 0) + s(1, 1)
    out = (F32(0.5) * (corner(1, 1) + inner)          # A + (B,C,D,E)
           + F32(0.25) * corner(0, 0)                 # F + L (duplicated tap)
           + F32(0.25) * corner(1, 0)                 # G (x2)
           + F32(0.125) * corner(2, 1)                # H
           + F32(0.375) * corner(2, 2)                # I + J (duplicated tap)
           + F32(0.25) * corner(1, 2)                 # K (x2)
           + F32(0.25) * corner(0, 1))                # M (x2)
    return out * F32(0.25)


def _tent3_ext(img):
    """3x3 tent convolution [1,2,1]x[1,2,1]/16 of the clamp-extension of
    ``img``, evaluated on the extended grid rows/cols -1..h — one texel
    beyond each edge, so downstream bilinear taps that land outside the
    image read the true convolved extension (not a clamp of the interior
    conv, which differs at borders)."""
    h, w, _ = img.shape
    p = _pad_edge(img, 2, 2, 2, 2)
    H, W = h + 2, w + 2

    def s(dy, dx):  # conv tap over the extended output grid
        return p[1 + dy:1 + dy + H, 1 + dx:1 + dx + W]

    row = s(-1, -1) + F32(2.0) * s(-1, 0) + s(-1, 1)
    mid = s(0, -1) + F32(2.0) * s(0, 0) + s(0, 1)
    bot = s(1, -1) + F32(2.0) * s(1, 0) + s(1, 1)
    return (row + F32(2.0) * mid + bot) * F32(1.0 / 16.0)


def _axis_up2(a, n_src, axis):
    """One axis of exact 2x bilinear upsampling.  ``a`` carries one extra
    sample on each side along ``axis`` (clamp-extension or extended conv):
    output pixel centers land at source coordinates k +- 0.25, i.e. fixed
    (0.75, 0.25) tap weights (the ``textureLod`` phase, bloom.comp:118-140)."""
    sl = [slice(None)] * a.ndim

    def take(start):
        sl2 = list(sl)
        sl2[axis] = slice(start, start + n_src)
        return a[tuple(sl2)]

    lo, mid, hi = take(0), take(1), take(2)
    even = F32(0.25) * lo + F32(0.75) * mid   # out 2k   -> src k - 0.25
    odd = F32(0.75) * mid + F32(0.25) * hi    # out 2k+1 -> src k + 0.25
    out = jnp.stack([even, odd], axis=axis + 1)
    shape = list(even.shape)
    shape[axis] *= 2
    return out.reshape(shape)


def _upsample2x_from_ext(ext, h: int, w: int, out_h: int, out_w: int):
    """2x bilinear upsample given the (h+2, w+2) extended source: row pass
    first, then rebuild the column extension by row-upsampling ext's edge
    columns (row upsampling is per-column linear, so this is exact)."""
    up = _axis_up2(ext[:, 1:1 + w], h, 0)
    left = _axis_up2(ext[:, 0:1], h, 0)
    right = _axis_up2(ext[:, -1:], h, 0)
    up = _axis_up2(jnp.concatenate([left, up, right], axis=1), w, 1)
    return up[:out_h, :out_w]


def _upsample2x_bilinear(img, out_h: int, out_w: int):
    """Exact 2x bilinear upsample with clamp-to-edge (composite.comp:46's
    single ``texture(bloomTexture, uv)`` tap at full res)."""
    h, w, _ = img.shape
    return _upsample2x_from_ext(_pad_edge(img, 1, 1, 1, 1), h, w,
                                out_h, out_w)


def upsample_tent9(img, out_h: int, out_w: int):
    """UpsampleTent9 (bloom.comp:91-109): tent-filtered 2x bilinear upsample
    to (out_h, out_w) (which may be the pre-pad odd size)."""
    h, w, _ = img.shape
    return _upsample2x_from_ext(_tent3_ext(img), h, w, out_h, out_w)


def bloom_pyramid(image, threshold: float = 1.0, knee: float = 0.1,
                  max_mips: int = 8):
    """Full bloom chain; returns the half-resolution bloom texture.

    Orchestration (the reference compiles the shader but never builds the
    dispatch chain, so this is the standard prefilter/down/up schedule its
    modes imply, bloom.comp:112-146): chain[0] = Prefilter(Down13(screen));
    chain[k] = Down13(chain[k-1]) while min dim > 4; then accumulate
    upward: u[k] = chain[k] + UpsampleTent9(u[k+1]) (MODE_UPSAMPLE_FIRST /
    MODE_UPSAMPLE both reduce to this).
    """
    chain = [prefilter(downsample_box13(image), threshold, knee)]
    while len(chain) < max_mips and min(chain[-1].shape[:2]) > 4:
        chain.append(downsample_box13(chain[-1]))
    up = chain[-1]
    for k in range(len(chain) - 2, -1, -1):
        h, w, _ = chain[k].shape
        up = chain[k] + upsample_tent9(up, h, w)
    return up


def bloom(image, threshold: float = 1.0, knee: float = 0.1,
          max_mips: int = 8):
    """Full-resolution bloom: half-res pyramid + the single bilinear
    ``texture(bloomTexture, uv)`` tap of composite.comp:46."""
    h, w, _ = image.shape
    half = bloom_pyramid(image, threshold, knee, max_mips)
    return _upsample2x_bilinear(half, h, w)


def composite(screen, bloom_tex=None):
    """composite.comp:35-55, exact (quirky) order: optional bloom add, then
    pow(1/2.2) gamma, then PBR-neutral tonemap."""
    result = screen if bloom_tex is None else screen + bloom_tex
    result = jnp.power(jnp.maximum(result, F32(0.0)), F32(1.0 / 2.2))
    return tm.pbr_neutral(result)

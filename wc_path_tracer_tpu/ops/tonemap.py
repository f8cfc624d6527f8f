"""Tonemap operator library.

The reference ships these as include/TonemapFunctions.glsl — compiled in but
never dispatched (quirk §2.4(9): the display shows raw linear HDR, and the
composite.comp pass that would apply PBRNeutral is never wired).  Here they
are first-class post ops selectable via RenderConfig.tonemap.

All functions are elementwise jnp, differentiable, and transcribed from
src/shaders/include/TonemapFunctions.glsl.
"""

from __future__ import annotations

import jax.numpy as jnp

import numpy as np

F32 = np.float32  # np scalar ctor: jnp.float32(x) would create device consts


def none(x):
    return x


def aces(x):
    """Narkowicz ACES fit (TonemapFunctions.glsl:5-14)."""
    a, b, c, d, e = F32(2.51), F32(0.03), F32(2.43), F32(0.59), F32(0.14)
    return (x * (a * x + b)) / (x * (c * x + d) + e)


def pbr_neutral(color):
    """Khronos PBR-neutral (TonemapFunctions.glsl:16-36), vectorized over
    trailing RGB axis."""
    start_compression = F32(0.8 - 0.04)
    desaturation = F32(0.15)
    x = jnp.min(color, axis=-1, keepdims=True)
    offset = jnp.where(x < F32(0.08), x - F32(6.25) * x * x, F32(0.04))
    color = color - offset
    peak = jnp.max(color, axis=-1, keepdims=True)
    d = F32(1.0) - start_compression
    new_peak = F32(1.0) - d * d / (peak + d - start_compression)
    scaled = color * new_peak / peak
    g = F32(1.0) - F32(1.0) / (desaturation * (peak - new_peak) + F32(1.0))
    out = scaled * (F32(1.0) - g) + new_peak * g
    return jnp.where(peak < start_compression, color, out)


def unreal(x):
    return x / (x + F32(0.155)) * F32(1.019)


def filmic(x):
    X = jnp.maximum(F32(0.0), x - F32(0.004))
    r = (X * (F32(6.2) * X + F32(0.5))) / (X * (F32(6.2) * X + F32(1.7)) + F32(0.06))
    return jnp.power(r, F32(2.2))


def lottes(x):
    a = F32(1.6)
    d = F32(0.977)
    hdr_max = F32(8.0)
    mid_in = F32(0.18)
    mid_out = F32(0.267)
    b = (-(mid_in ** a) + (hdr_max ** a) * mid_out) / (
        ((hdr_max ** (a * d)) - (mid_in ** (a * d))) * mid_out)
    c = ((hdr_max ** (a * d)) * (mid_in ** a) - (hdr_max ** a) * (mid_in ** (a * d)) * mid_out) / (
        ((hdr_max ** (a * d)) - (mid_in ** (a * d))) * mid_out)
    xs = jnp.maximum(x, F32(0.0))
    return jnp.power(xs, a) / (jnp.power(xs, a * d) * b + c)


def reinhard(x):
    return x / (F32(1.0) + x)


def reinhard2(x):
    l_white = F32(4.0)
    return (x * (F32(1.0) + x / (l_white * l_white))) / (F32(1.0) + x)


def _smoothstep(e0, e1, x):
    t = jnp.clip((x - e0) / (e1 - e0), F32(0.0), F32(1.0))
    return t * t * (F32(3.0) - F32(2.0) * t)


def uchimura(x, P=1.0, a=1.0, m=0.22, l=0.4, c=1.33, b=0.0):
    """Uchimura 2017 (TonemapFunctions.glsl:77-110)."""
    P, a, m, l, c, b = map(F32, (P, a, m, l, c, b))
    l0 = ((P - m) * l) / a
    S0 = m + l0
    S1 = m + a * l0
    C2 = (a * P) / (P - S1)
    CP = -C2 / P
    w0 = F32(1.0) - _smoothstep(F32(0.0), m, x)
    w2 = jnp.where(x >= m + l0, F32(1.0), F32(0.0))
    w1 = F32(1.0) - w0 - w2
    T = m * jnp.power(jnp.maximum(x, F32(0.0)) / m, c) + b
    S = P - (P - S1) * jnp.exp(CP * (x - S0))
    L = m + a * (x - m)
    return T * w0 + L * w1 + S * w2


def _uncharted2_curve(x):
    A, B, C, D, E, F = map(F32, (0.15, 0.50, 0.10, 0.20, 0.02, 0.30))
    return ((x * (A * x + C * B) + D * E) / (x * (A * x + B) + D * F)) - E / F


def uncharted2(color):
    W = F32(11.2)
    curr = _uncharted2_curve(F32(2.0) * color)
    white_scale = F32(1.0) / _uncharted2_curve(W)
    return curr * white_scale


def srgb_oecf(linear):
    """Fast sRGB OECF: pow(x, 1/2.2)."""
    return jnp.power(jnp.maximum(linear, F32(0.0)), F32(1.0 / 2.2))


def srgb_from_linear(x):
    """Exact sRGB transfer (TonemapFunctions.glsl:137)."""
    x = jnp.maximum(x, F32(0.0))
    return jnp.where(x <= F32(0.0031308), x * F32(12.92),
                     jnp.power(x, F32(1.0 / 2.4)) * F32(1.055) - F32(0.055))


def srgb_to_linear(x):
    return jnp.where(x <= F32(0.04045), x / F32(12.92),
                     jnp.power((x + F32(0.055)) / F32(1.055), F32(2.4)))


def luminance(rgb):
    """Rec.709 luma (Math.glsl:7)."""
    w = jnp.array([0.2126, 0.7152, 0.0722], F32)
    return jnp.sum(rgb * w, axis=-1)


TONEMAPS = {
    "none": none,
    "aces": aces,
    "pbr_neutral": pbr_neutral,
    "unreal": unreal,
    "filmic": filmic,
    "lottes": lottes,
    "reinhard": reinhard,
    "reinhard2": reinhard2,
    "uchimura": uchimura,
    "uncharted2": uncharted2,
    "srgb": srgb_from_linear,
}


def apply(img, name: str):
    try:
        fn = TONEMAPS[name]
    except KeyError:
        raise ValueError(f"unknown tonemap {name!r}; options: {sorted(TONEMAPS)}")
    return fn(img)

"""BSDF sampling/evaluation helpers beyond the reference's two lobes.

The reference has exactly METAL (mirror + Gaussian fuzz) and DIELECTRIC
(Fresnel reflect/refract) — both implemented inline in render/golden.py
exactly as pathTracer.comp:256-280.  This module adds the BASELINE-mandated
extensions:

- Lambertian cosine-weighted sampling (used by golden's LAMBERTIAN type)
- GGX microfacet conductor lobe: NDF importance sampling + Smith masking,
  Schlick Fresnel with a metallic F0 lerp (this is where the reference's
  dead ``metallic`` parameter, quirk §2.4(4), becomes live)

All functions are batched over leading dims and differentiable.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

F32 = np.float32  # np scalar ctor: jnp.float32(x) would create device consts
PI = np.float32(3.14159265358979323846)


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def orthonormal_basis(n):
    """Branchless Frisvad-style ONB around normal n -> (t, b)."""
    sign = jnp.where(n[..., 2] >= 0.0, F32(1.0), F32(-1.0))
    a = F32(-1.0) / (sign + n[..., 2])
    bb = n[..., 0] * n[..., 1] * a
    t = jnp.stack([F32(1.0) + sign * n[..., 0] ** 2 * a,
                   sign * bb,
                   -sign * n[..., 0]], axis=-1)
    b = jnp.stack([bb,
                   sign + n[..., 1] ** 2 * a,
                   -n[..., 1]], axis=-1)
    return t, b


def schlick_fresnel(f0, cos_theta):
    """F = f0 + (1-f0)(1-cos)^5."""
    c = jnp.clip(cos_theta, 0.0, 1.0)[..., None]
    return f0 + (F32(1.0) - f0) * (F32(1.0) - c) ** 5


def ggx_sample_half(normal, rough, u1, u2):
    """Importance-sample the GGX NDF around ``normal``; alpha = rough^2.

    theta_h = atan(alpha * sqrt(u1 / (1-u1))), phi = 2 pi u2.
    Returns the world-space half vector.
    """
    from wc_path_tracer_tpu.ops.intersect import safe_sqrt
    alpha = jnp.maximum(rough * rough, F32(1e-4))
    u1 = jnp.clip(u1, F32(0.0), F32(1.0 - 1e-7))
    tan2 = (alpha * alpha) * u1 / (F32(1.0) - u1)
    cos_h = F32(1.0) / jnp.sqrt(F32(1.0) + tan2)
    # safe_sqrt: masked lanes draw u1=0 -> sin_h=sqrt(0), whose inf gradient
    # would NaN-poison every roughness gradient through the unselected branch
    sin_h = safe_sqrt(F32(1.0) - cos_h * cos_h)
    phi = F32(2.0) * PI * u2
    t, b = orthonormal_basis(normal)
    return (t * (sin_h * jnp.cos(phi))[..., None]
            + b * (sin_h * jnp.sin(phi))[..., None]
            + normal * cos_h[..., None])


def smith_g1(cos_v, rough):
    """Smith height-correlated-free G1 for GGX (separable form)."""
    alpha = jnp.maximum(rough * rough, F32(1e-4))
    c = jnp.clip(cos_v, F32(1e-6), F32(1.0))
    tan2 = (F32(1.0) - c * c) / (c * c)
    return F32(2.0) / (F32(1.0) + jnp.sqrt(F32(1.0) + alpha * alpha * tan2))


def ggx_sample(normal, wo, albedo, rough, metallic, u1, u2):
    """Sample the GGX conductor lobe.

    wo points *away* from the surface (= -ray.direction).
    Returns (wi, weight, valid): ``weight`` is f*cos/pdf for NDF sampling
      = F * G1(wo) * G1(wi) * dot(wo, h) / (cos_o * cos_h)
    ``valid`` is False when the sampled direction dips under the surface
    (callers should kill or re-treat those paths; golden sets weight 0).
    """
    h = ggx_sample_half(normal, rough, u1, u2)
    cos_oh = _dot(wo, h)
    wi = F32(2.0) * cos_oh[..., None] * h - wo  # reflect wo about h
    cos_o = _dot(wo, normal)
    cos_i = _dot(wi, normal)
    cos_h = _dot(h, normal)
    f0 = (F32(0.04) * (F32(1.0) - metallic[..., None])
          + albedo * metallic[..., None])
    F = schlick_fresnel(f0, cos_oh)
    G = smith_g1(cos_o, rough) * smith_g1(cos_i, rough)
    denom = jnp.maximum(cos_o * cos_h, F32(1e-6))
    weight = F * (G * jnp.clip(cos_oh, 0.0, None) / denom)[..., None]
    valid = (cos_i > F32(0.0)) & (cos_o > F32(0.0)) & (cos_oh > F32(0.0))
    weight = jnp.where(valid[..., None], weight, F32(0.0))
    return wi, weight, valid


def lambert_brdf_over_pi(albedo):
    """Lambertian BRDF value: albedo / pi (for NEE direct-light estimates)."""
    return albedo / PI


def lambert_pdf(normal, wi):
    """Cosine-hemisphere pdf (solid angle): max(cos, 0) / pi."""
    return jnp.clip(_dot(normal, wi), F32(0.0), None) / PI


def ggx_d(cos_h, rough):
    """GGX normal distribution D(h); alpha = rough^2 (same convention as
    ggx_sample_half, whose h-sampling pdf is D(h) * cos_h)."""
    alpha = jnp.maximum(rough * rough, F32(1e-4))
    a2 = alpha * alpha
    c = jnp.clip(cos_h, F32(0.0), F32(1.0))
    d = c * c * (a2 - F32(1.0)) + F32(1.0)
    return a2 / jnp.maximum(PI * d * d, F32(1e-12))


def ggx_pdf(normal, wo, wi, rough):
    """Solid-angle pdf of ggx_sample producing ``wi`` given ``wo``.

    NDF half-vector sampling: pdf(wi) = D(h) cos_h / (4 dot(wo, h)).
    Zero for directions under the surface (the sampler marks those invalid).
    """
    from wc_path_tracer_tpu.ops.intersect import safe_sqrt
    h = wo + wi
    hn = h / jnp.maximum(
        safe_sqrt(_dot(h, h))[..., None], F32(1e-12))
    cos_h = _dot(hn, normal)
    cos_oh = _dot(wo, hn)
    pdf = ggx_d(cos_h, rough) * jnp.clip(cos_h, F32(0.0), None) \
        / jnp.maximum(F32(4.0) * cos_oh, F32(1e-6))
    valid = (_dot(wi, normal) > F32(0.0)) & (_dot(wo, normal) > F32(0.0)) \
        & (cos_oh > F32(0.0))
    return jnp.where(valid, pdf, F32(0.0))


def ggx_eval(normal, wo, wi, albedo, rough, metallic):
    """GGX conductor BRDF value f(wo, wi) (for NEE direct-light estimates).

    f = D(h) F(dot(wo,h)) G1(wo) G1(wi) / (4 cos_o cos_i); callers multiply
    by the NEE geometric term which already contains cos_i.
    """
    from wc_path_tracer_tpu.ops.intersect import safe_sqrt
    h = wo + wi
    hn = h / jnp.maximum(safe_sqrt(_dot(h, h))[..., None], F32(1e-12))
    cos_h = _dot(hn, normal)
    cos_oh = _dot(wo, hn)
    cos_o = _dot(wo, normal)
    cos_i = _dot(wi, normal)
    f0 = (F32(0.04) * (F32(1.0) - metallic[..., None])
          + albedo * metallic[..., None])
    F = schlick_fresnel(f0, cos_oh)
    D = ggx_d(cos_h, rough)
    G = smith_g1(cos_o, rough) * smith_g1(cos_i, rough)
    denom = jnp.maximum(F32(4.0) * cos_o * cos_i, F32(1e-6))
    valid = (cos_i > F32(0.0)) & (cos_o > F32(0.0)) & (cos_oh > F32(0.0))
    return jnp.where(valid[..., None], F * (D * G / denom)[..., None],
                     F32(0.0))

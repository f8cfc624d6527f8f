"""Bit-exact PCG PRNG matching the reference shader's RNG.

Reference: src/shaders/include/Random.glsl.

Two deliberate quirks of the reference are reproduced exactly because the
whole image comparison contract depends on the bit stream:

1. ``rand`` (Random.glsl:27-32) overwrites the PRNG state with the *output*
   word of ``rand_pcg`` rather than keeping the LCG-advanced state, i.e. the
   effective state update is ``state <- permute(state)`` where ``permute`` is
   the PCG output function.  The LCG advance computed inside ``rand_pcg``
   (Random.glsl:21) is discarded by the caller.
2. the uint32 -> float conversion is ``float(x) * uintBitsToFloat(0x2f800000u)``
   (= x * 2^-32 with round-to-nearest on the int->float conversion), which can
   return exactly 0.0 and exactly 1.0.

All functions are shape-polymorphic: ``state`` may be any uint32 array and
every lane evolves independently (one PRNG stream per ray, exactly like one
stream per pixel-invocation in the reference).

Masked variants (``rand_masked`` etc.) advance a lane's state only where
``mask`` is True.  They exist because the reference's per-thread control flow
draws a *different number* of randoms per bounce depending on material type
and total internal reflection (pathTracer.comp:256-275, note the short-circuit
``||`` at :273 skips the ``rand`` draw under TIR); on TPU the same per-lane
sequences are reproduced with masked vectorized draws.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# LCG / permutation constants, Random.glsl:12-14.
_PCG_MULT = np.uint32(747796405)
_PCG_INC = np.uint32(2891336453)
_PCG_XSH_MULT = np.uint32(277803737)

# uintBitsToFloat(0x2f800000u) == 2**-32 (Random.glsl:31).
_INV_2_32 = np.float32(2.0 ** -32)

_PI = np.float32(3.14159265358979323846)  # constants.glsl PI


def _permute(state):
    """PCG output function (RXS-M-XS variant used by the reference).

    word = ((state >> ((state >> 28) + 4)) ^ state) * 277803737;
    return (word >> 22) ^ word;               (Random.glsl:13-14)
    """
    state = state.astype(jnp.uint32)
    shift = (state >> np.uint32(28)) + np.uint32(4)
    word = ((state >> shift) ^ state) * _PCG_XSH_MULT
    return (word >> np.uint32(22)) ^ word


def pcg_hash(seed):
    """Initial seeding hash: permute(seed * MULT + INC). Random.glsl:10-15."""
    seed = seed.astype(jnp.uint32) if hasattr(seed, "astype") else jnp.uint32(seed)
    return _permute(seed * _PCG_MULT + _PCG_INC)


def rand_u32(state):
    """One draw of the reference's ``rand`` chain, returning the raw uint32.

    Because ``rand`` stores the output back into the state (Random.glsl:30),
    value == new_state.  Returns (value_u32, new_state).
    """
    x = _permute(state)
    return x, x


def u32_to_float(x):
    """float(x) * 2^-32 — matches GLSL float(uint) round-to-nearest. [0.0, 1.0]."""
    return x.astype(jnp.float32) * _INV_2_32


def rand(state):
    """Draw a float in [0, 1] and advance state. Returns (value, new_state)."""
    x, state = rand_u32(state)
    return u32_to_float(x), state


def rand_masked(state, mask):
    """``rand`` that only advances lanes where mask is True.

    Lanes with mask False keep their state; their returned value is the
    would-be draw (callers must not use it where mask is False).
    """
    x = _permute(state)
    new_state = jnp.where(mask, x, state)
    return u32_to_float(x), new_state


def random_normal(state, mask=None):
    """Box-Muller normal draw, 2 rand calls. Random.glsl:43-48.

    theta = 2*pi*rand(); rho = sqrt(-2*log(rand())); return rho*cos(theta).
    Note the reference does NOT guard log(0): rand()==0 yields +inf rho; we
    faithfully do the same (probability 2^-32 per draw).
    """
    if mask is None:
        u1, state = rand(state)
        u2, state = rand(state)
    else:
        u1, state = rand_masked(state, mask)
        u2, state = rand_masked(state, mask)
    theta = np.float32(2.0) * _PI * u1
    rho = jnp.sqrt(np.float32(-2.0) * jnp.log(u2))
    return rho * jnp.cos(theta), state


def random_direction(state, mask=None):
    """Uniform direction on the sphere via normalized 3D Gaussian (6 rand calls).

    Random.glsl:50-56. Returns (dir[..., 3], new_state).
    """
    x, state = random_normal(state, mask)
    y, state = random_normal(state, mask)
    z, state = random_normal(state, mask)
    v = jnp.stack([x, y, z], axis=-1)
    norm = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
    return v / norm, state


def random_hemisphere_direction(normal, state, mask=None):
    """RandomDirection flipped into the hemisphere of ``normal``. Random.glsl:58-62."""
    d, state = random_direction(state, mask)
    s = jnp.sign(jnp.sum(normal * d, axis=-1, keepdims=True))
    return d * s, state


def pixel_seed(pixel_index, frame_count):
    """Per-pixel per-frame seed: pcg_hash(pixel + frame*719393). pathTracer.comp:304-305."""
    pixel_index = jnp.asarray(pixel_index, jnp.uint32)
    frame = jnp.asarray(frame_count, jnp.uint32)
    return pcg_hash(pixel_index + frame * np.uint32(719393))

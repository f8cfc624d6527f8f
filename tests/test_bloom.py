"""Bloom + composite tests.

The oracle here implements bloom.comp literally: a per-pixel loop calling a
clamp-to-edge bilinear sampler at the exact uv offsets of the shader
(DownsampleBox13 bloom.comp:26-66, UpsampleTent9 :91-109, including the
duplicated J/L taps).  The framework's stencil form must match it to float
tolerance — proving the derivation (corner samples = 2x2 averages, +-0.5
samples = texel centers, tent9 = tent-conv then one bilinear tap).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wc_path_tracer_tpu.ops import bloom as B
from wc_path_tracer_tpu.ops import tonemap as tm


def _bilinear(tex, u, v):
    """GL bilinear sample with clamp-to-edge, texel centers at (k+0.5)."""
    h, w, _ = tex.shape
    x = u * w - 0.5
    y = v * h - 0.5
    x0, y0 = int(np.floor(x)), int(np.floor(y))
    fx, fy = x - x0, y - y0

    def at(yy, xx):
        return tex[min(max(yy, 0), h - 1), min(max(xx, 0), w - 1)]

    return ((1 - fx) * (1 - fy) * at(y0, x0) + fx * (1 - fy) * at(y0, x0 + 1)
            + (1 - fx) * fy * at(y0 + 1, x0) + fx * fy * at(y0 + 1, x0 + 1))


def _oracle_down13(src, out_h, out_w):
    """Literal DownsampleBox13 (bloom.comp:26-66), J/L duplicate taps kept."""
    sh, sw, _ = src.shape
    tex = 1.0 / np.array([sw, sh])
    out = np.zeros((out_h, out_w, 3), np.float64)
    for i in range(out_h):
        for j in range(out_w):
            u, v = (j + 0.5) / out_w, (i + 0.5) / out_h
            ts = tex * 0.5

            def S(dx, dy):
                return _bilinear(src, u + ts[0] * dx, v + ts[1] * dy)

            A = _bilinear(src, u, v)
            Bt, C, D, E = S(-1, -1), S(-1, 1), S(1, 1), S(1, -1)
            F, G, H = S(-2, -2), S(-2, 0), S(0, 2)
            I = S(2, 2)
            J = S(2, 2)
            K = S(2, 0)
            L = S(-2, -2)
            M = S(0, -2)
            r = (Bt + C + D + E) * 0.5
            r += (F + G + A + M) * 0.125
            r += (G + H + I + A) * 0.125
            r += (A + I + J + K) * 0.125
            r += (M + A + K + L) * 0.125
            out[i, j] = r * 0.25
    return out


def _oracle_tent9(src, out_h, out_w):
    """Literal UpsampleTent9 (bloom.comp:91-109), radius 1."""
    sh, sw, _ = src.shape
    tx, ty = 1.0 / sw, 1.0 / sh
    out = np.zeros((out_h, out_w, 3), np.float64)
    for i in range(out_h):
        for j in range(out_w):
            u, v = (j + 0.5) / out_w, (i + 0.5) / out_h
            r = 4.0 * _bilinear(src, u, v)
            r += _bilinear(src, u - tx, v - ty)
            r += 2.0 * _bilinear(src, u, v - ty)
            r += _bilinear(src, u + tx, v - ty)
            r += 2.0 * _bilinear(src, u - tx, v)
            r += 2.0 * _bilinear(src, u + tx, v)
            r += _bilinear(src, u - tx, v + ty)
            r += 2.0 * _bilinear(src, u, v + ty)
            r += _bilinear(src, u + tx, v + ty)
            out[i, j] = r / 16.0
    return out


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def test_downsample13_matches_shader_oracle(rng):
    src = rng.uniform(0, 4, (12, 16, 3)).astype(np.float32)
    got = np.asarray(B.downsample_box13(jnp.asarray(src)))
    want = _oracle_down13(src, 6, 8)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_upsample_tent9_matches_shader_oracle(rng):
    src = rng.uniform(0, 4, (5, 7, 3)).astype(np.float32)
    got = np.asarray(B.upsample_tent9(jnp.asarray(src), 10, 14))
    want = _oracle_tent9(src, 10, 14)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_prefilter_kills_dark_passes_bright():
    dark = jnp.full((8, 8, 3), 0.2)
    bright = jnp.full((8, 8, 3), 5.0)
    assert float(jnp.max(B.prefilter(dark, threshold=1.0, knee=0.1))) == 0.0
    out = np.asarray(B.prefilter(bright, threshold=1.0, knee=0.1))
    # scale = (brightness - threshold)/brightness = 4/5
    np.testing.assert_allclose(out, 4.0, rtol=1e-5)
    # clamp at 20 (bloom.comp:83)
    huge = jnp.full((4, 4, 3), 100.0)
    np.testing.assert_allclose(np.asarray(B.prefilter(huge, 1.0, 0.1)),
                               19.0, rtol=1e-5)


def test_bloom_spreads_bright_spot():
    img = np.zeros((32, 32, 3), np.float32)
    img[16, 16] = 50.0
    bl = np.asarray(B.bloom(jnp.asarray(img), threshold=1.0))
    assert bl.shape == img.shape
    assert np.all(np.isfinite(bl))
    assert bl[16, 16, 0] > 0
    # energy reaches well beyond the source pixel (pyramid spreading)
    assert bl[16, 26, 0] > 0
    # dark image -> no bloom
    assert float(np.max(np.asarray(B.bloom(jnp.zeros((32, 32, 3)))))) == 0.0


def test_bloom_odd_sizes_and_jit():
    img = jnp.ones((33, 19, 3)) * 3.0
    out = jax.jit(lambda x: B.bloom(x, 1.0, 0.1))(img)
    assert out.shape == (33, 19, 3)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_composite_order_matches_shader():
    """composite.comp:44-52: bloom add, then pow(1/2.2), THEN pbr_neutral."""
    rng = np.random.default_rng(3)
    screen = jnp.asarray(rng.uniform(0, 3, (6, 6, 3)).astype(np.float32))
    blm = jnp.asarray(rng.uniform(0, 1, (6, 6, 3)).astype(np.float32))
    got = np.asarray(B.composite(screen, blm))
    want = np.asarray(tm.pbr_neutral(jnp.power(screen + blm, 1.0 / 2.2)))
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # no bloom branch
    got2 = np.asarray(B.composite(screen))
    want2 = np.asarray(tm.pbr_neutral(jnp.power(screen, 1.0 / 2.2)))
    np.testing.assert_allclose(got2, want2, rtol=1e-6)


def test_bloom_differentiable():
    img = jnp.ones((16, 16, 3)) * 2.0

    def loss(x):
        return jnp.sum(B.bloom(x, threshold=0.5, knee=0.2))

    g = jax.grad(loss)(img)
    assert g.shape == img.shape
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.max(jnp.abs(g))) > 0

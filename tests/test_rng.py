"""Bit-exactness tests for the PCG PRNG vs an independent NumPy model.

The NumPy model below is written directly from src/shaders/include/Random.glsl
and serves as the oracle for the JAX implementation.
"""

import numpy as np
import jax.numpy as jnp

from wc_path_tracer_tpu.ops import rng


# --- independent NumPy oracle (transcribed from Random.glsl) ---

def np_permute(state: np.uint32) -> np.uint32:
    state = np.uint32(state)
    with np.errstate(over="ignore"):
        shift = np.uint32((int(state) >> 28) + 4)
        word = np.uint32(((int(state) >> int(shift)) ^ int(state)) * 277803737 & 0xFFFFFFFF)
        return np.uint32((int(word) >> 22) ^ int(word))


def np_pcg_hash(seed: int) -> np.uint32:
    state = np.uint32((seed * 747796405 + 2891336453) & 0xFFFFFFFF)
    return np_permute(state)


def np_rand(state: np.uint32):
    """GLSL rand(): x = rand_pcg(state); state = x; return float(x)*2^-32."""
    x = np_permute(state)  # rand_pcg outputs permute(old state); rand keeps x as state
    return np.float32(np.float32(x) * np.float32(2.0 ** -32)), x


def test_pcg_hash_matches_numpy():
    seeds = np.array([0, 1, 2, 12345, 719393, 0xFFFFFFFF, 0x80000000], dtype=np.uint32)
    got = np.asarray(rng.pcg_hash(jnp.asarray(seeds)))
    want = np.array([np_pcg_hash(int(s)) for s in seeds], dtype=np.uint32)
    np.testing.assert_array_equal(got, want)


def test_rand_chain_matches_numpy():
    state_j = rng.pcg_hash(jnp.uint32(42))
    state_n = np_pcg_hash(42)
    for _ in range(100):
        vj, state_j = rng.rand(state_j)
        vn, state_n = np_rand(state_n)
        assert np.float32(vj) == vn
        assert np.uint32(state_j) == state_n


def test_rand_is_uniform_01():
    states = rng.pcg_hash(jnp.arange(100_000, dtype=jnp.uint32))
    v, _ = rng.rand(states)
    v = np.asarray(v)
    assert v.min() >= 0.0 and v.max() <= 1.0
    assert abs(v.mean() - 0.5) < 0.005
    assert abs(v.var() - 1.0 / 12.0) < 0.002


def test_masked_rand_freezes_masked_lanes():
    states = rng.pcg_hash(jnp.arange(8, dtype=jnp.uint32))
    mask = jnp.array([True, False] * 4)
    _, new_states = rng.rand_masked(states, mask)
    new_states = np.asarray(new_states)
    old = np.asarray(states)
    assert (new_states[1::2] == old[1::2]).all()
    assert (new_states[0::2] != old[0::2]).all()


def test_masked_sequence_equals_per_lane_sequential():
    """A lane drawing k randoms through masked calls must match k sequential draws."""
    start = rng.pcg_hash(jnp.arange(4, dtype=jnp.uint32))
    # lane i draws on call j iff j % (i+1) == 0 -> varying draw counts
    states = start
    draws = [[] for _ in range(4)]
    for j in range(6):
        mask = jnp.array([j % (i + 1) == 0 for i in range(4)])
        v, states = rng.rand_masked(states, mask)
        for i in range(4):
            if j % (i + 1) == 0:
                draws[i].append(float(v[i]))
    # oracle: sequential draws per lane
    for i in range(4):
        s = np.uint32(np.asarray(start)[i])
        for expect in draws[i]:
            v, s = np_rand(s)
            assert np.float32(expect) == v


def test_random_direction_unit_norm_and_isotropic():
    states = rng.pcg_hash(jnp.arange(50_000, dtype=jnp.uint32))
    d, _ = rng.random_direction(states)
    d = np.asarray(d)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    # isotropy: mean close to zero in every component
    assert np.abs(d.mean(axis=0)).max() < 0.01


def test_random_normal_matches_glsl_formula():
    state = rng.pcg_hash(jnp.uint32(7))
    # oracle
    s = np_pcg_hash(7)
    u1, s = np_rand(s)
    u2, s = np_rand(s)
    want = np.float32(np.sqrt(-2.0 * np.log(np.float64(u2))) * np.cos(2.0 * np.pi * np.float64(u1)))
    got, new_state = rng.random_normal(state)
    # JAX computes log/cos in f32; compare against the f64 oracle loosely.
    np.testing.assert_allclose(float(got), want, rtol=1e-4)
    assert np.uint32(new_state) == s


def test_hemisphere_direction_in_hemisphere():
    states = rng.pcg_hash(jnp.arange(1000, dtype=jnp.uint32))
    n = jnp.tile(jnp.array([[0.0, 1.0, 0.0]], jnp.float32), (1000, 1))
    d, _ = rng.random_hemisphere_direction(n, states)
    assert (np.asarray(d)[:, 1] >= 0).all()


def test_pixel_seed_matches_reference_formula():
    # pathTracer.comp:304-305: seed = pcg_hash(x + y*W + frames*719393)
    x, y, w, frames = 13, 7, 640, 5
    want = np_pcg_hash((x + y * w + frames * 719393) & 0xFFFFFFFF)
    got = rng.pixel_seed(jnp.uint32(x + y * w), jnp.uint32(frames))
    assert np.uint32(got) == want

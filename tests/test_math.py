"""Core math: normalize/cross/equirect UV (reference lib.rs:119-135, wgsl:93-98)."""

import jax.numpy as jnp
import numpy as np

from bhr_tpu.core.math import (
    cross,
    direction_to_equirectangular_uv,
    normalize,
    normalize_unguarded,
)


def test_normalize_unit_length():
    v = jnp.array([3.0, 4.0, 0.0])
    n = normalize(v)
    np.testing.assert_allclose(np.asarray(n), [0.6, 0.8, 0.0], rtol=1e-6)


def test_normalize_zero_guard():
    # reference lib.rs:119-126 returns the input unchanged for zero length
    v = jnp.zeros(3)
    np.testing.assert_array_equal(np.asarray(normalize(v)), np.zeros(3))


def test_normalize_batched():
    v = jnp.array([[2.0, 0.0, 0.0], [0.0, 0.0, -5.0]])
    n = np.asarray(normalize(v))
    np.testing.assert_allclose(n, [[1, 0, 0], [0, 0, -1]], atol=1e-7)


def test_cross_right_handed():
    x = jnp.array([1.0, 0.0, 0.0])
    y = jnp.array([0.0, 1.0, 0.0])
    np.testing.assert_allclose(np.asarray(cross(x, y)), [0, 0, 1], atol=1e-7)


def test_cross_matches_numpy(rng):
    a = rng.randn(10, 3).astype(np.float32)
    b = rng.randn(10, 3).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(cross(jnp.asarray(a), jnp.asarray(b))),
        np.cross(a, b),
        rtol=1e-5,
        atol=1e-6,
    )


def test_equirect_uv_cardinal_directions():
    # +X: atan2(0, 1) = 0 -> u = 0.5; y=0 -> v = 0.5
    uv = np.asarray(direction_to_equirectangular_uv(jnp.array([1.0, 0.0, 0.0])))
    np.testing.assert_allclose(uv, [0.5, 0.5], atol=1e-6)
    # +Y pole: v = 0
    uv = np.asarray(direction_to_equirectangular_uv(jnp.array([0.0, 1.0, 0.0])))
    np.testing.assert_allclose(uv[1], 0.0, atol=1e-6)
    # -Y pole: v = 1
    uv = np.asarray(direction_to_equirectangular_uv(jnp.array([0.0, -1.0, 0.0])))
    np.testing.assert_allclose(uv[1], 1.0, atol=1e-6)
    # +Z: atan2(1, 0) = pi/2 -> u = 0.75
    uv = np.asarray(direction_to_equirectangular_uv(jnp.array([0.0, 0.0, 1.0])))
    np.testing.assert_allclose(uv, [0.75, 0.5], atol=1e-6)


def test_equirect_uv_normalizes_input():
    # wgsl:94 normalizes before mapping — scaled vectors give identical UV
    d = jnp.array([2.0, 3.0, -1.0])
    uv1 = np.asarray(direction_to_equirectangular_uv(d))
    uv2 = np.asarray(direction_to_equirectangular_uv(d * 7.5))
    np.testing.assert_allclose(uv1, uv2, atol=1e-6)


def test_normalize_unguarded_matches_sqrt_div():
    v = jnp.array([1.0, 2.0, 3.0], jnp.float32)
    expected = np.asarray(v) / np.sqrt(np.sum(np.asarray(v) ** 2))
    np.testing.assert_allclose(np.asarray(normalize_unguarded(v)), expected, rtol=1e-6)

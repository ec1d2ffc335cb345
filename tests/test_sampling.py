"""Texture sampling semantics (reference lib.rs:414-421 sampler config)."""

import jax.numpy as jnp
import numpy as np

from bhr_tpu.ops.sampling import (
    pack_rgba8_planes,
    pack_texture_rgba8,
    quantize_rgba8,
    sample_bilinear,
    sample_equirect,
    sample_equirect_packed,
    unpack_frame,
)


def _tex(h=8, w=16, seed=3):
    rng = np.random.RandomState(seed)
    t = rng.randint(0, 256, (h, w, 4)).astype(np.float32) / 255.0
    return jnp.asarray(t)


def test_bilinear_texel_center_exact():
    tex = _tex()
    h, w = 8, 16
    # sampling exactly at texel centers returns the texel value
    u = (jnp.arange(w) + 0.5) / w
    v = jnp.full((w,), (3 + 0.5) / h)
    out = np.asarray(sample_bilinear(tex, u, v))
    np.testing.assert_allclose(out, np.asarray(tex)[3, :, :], atol=1e-6)


def test_bilinear_interpolates_midpoint():
    tex = _tex()
    h, w = 8, 16
    u = jnp.asarray([(2 + 1.0) / w])  # halfway between texels 2 and 3
    v = jnp.asarray([(4 + 0.5) / h])
    out = np.asarray(sample_bilinear(tex, u, v))[0]
    want = (np.asarray(tex)[4, 2] + np.asarray(tex)[4, 3]) / 2
    np.testing.assert_allclose(out, want, atol=1e-6)


def test_repeat_u_wraps_at_seam():
    tex = _tex()
    h, w = 8, 16
    # u slightly left of 0 must blend texels w-1 and 0 (AddressMode::Repeat)
    u = jnp.asarray([0.0])  # x = -0.5 -> x0 = -1 -> wraps to w-1, fx=0.5
    v = jnp.asarray([(4 + 0.5) / h])
    out = np.asarray(sample_bilinear(tex, u, v))[0]
    want = (np.asarray(tex)[4, w - 1] + np.asarray(tex)[4, 0]) / 2
    np.testing.assert_allclose(out, want, atol=1e-6)


def test_clamp_v_at_poles():
    tex = _tex()
    # v = 0 -> y = -0.5 -> clamps to row 0 (AddressMode::ClampToEdge)
    u = jnp.asarray([(5 + 0.5) / 16])
    out0 = np.asarray(sample_bilinear(tex, u, jnp.asarray([0.0])))[0]
    np.testing.assert_allclose(out0, np.asarray(tex)[0, 5], atol=1e-6)
    out1 = np.asarray(sample_bilinear(tex, u, jnp.asarray([1.0])))[0]
    np.testing.assert_allclose(out1, np.asarray(tex)[7, 5], atol=1e-6)


def test_packed_matches_float_path():
    """The packed-u32 sampler is the TPU fast path; on k/255 textures it
    must agree with the float reference sampler exactly."""
    tex = _tex(16, 32)
    packed = pack_texture_rgba8(tex)
    rng = np.random.RandomState(0)
    d = rng.randn(100, 3).astype(np.float32)
    dx, dy, dz = (jnp.asarray(d[:, i]) for i in range(3))
    r, g, b = sample_equirect_packed(packed, dx, dy, dz)
    ref = np.asarray(sample_equirect(tex, jnp.asarray(d)))[:, :3]
    got = np.stack([np.asarray(r), np.asarray(g), np.asarray(b)], -1)
    np.testing.assert_allclose(got, ref, atol=2e-6)


def test_quantize_rgba8():
    rgb = jnp.asarray([[0.0, 0.5, 1.0], [-0.1, 1.1, 0.25]])
    q = np.asarray(quantize_rgba8(rgb))
    assert q.dtype == np.uint8
    np.testing.assert_array_equal(q[0], [0, 128, 255, 255])
    np.testing.assert_array_equal(q[1], [0, 255, 64, 255])


def test_pack_unpack_frame_matches_quantize():
    rng = np.random.RandomState(1)
    c = rng.rand(8, 8, 3).astype(np.float32)
    ref = np.asarray(quantize_rgba8(jnp.asarray(c)))
    packed = pack_rgba8_planes(
        jnp.asarray(c[..., 0]), jnp.asarray(c[..., 1]), jnp.asarray(c[..., 2])
    )
    assert packed.dtype == jnp.uint32
    via_device = np.asarray(unpack_frame(packed))
    np.testing.assert_array_equal(via_device, ref)
    via_host = np.asarray(packed).view(np.uint8).reshape(8, 8, 4)
    np.testing.assert_array_equal(via_host, ref)


def test_pack_texture_lossless_roundtrip():
    tex = _tex()  # k/255 values by construction
    packed = np.asarray(pack_texture_rgba8(tex))
    r = (packed & 0xFF).astype(np.float32) / 255.0
    np.testing.assert_allclose(r, np.asarray(tex)[..., 0], atol=1e-7)

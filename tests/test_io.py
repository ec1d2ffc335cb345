"""Image/EXR I/O: loaders, writers, the native pipeline, and the exact
Reinhard + truncation conversion the reference applies (lib.rs:270-308)."""

import numpy as np
import pytest

from bhr_tpu.io import native
from bhr_tpu.io.image import get_image_data, save_image, write_png_pure
from bhr_tpu.io.skybox import (
    load_exr_image,
    load_skybox,
    procedural_starfield,
    read_exr,
    write_exr,
)


def test_exr_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    hdr = (rng.rand(12, 20, 4).astype(np.float32) * 5.0).astype(np.float32)
    p = str(tmp_path / "t.exr")
    write_exr(p, hdr)
    back = read_exr(p)
    np.testing.assert_allclose(back, hdr, rtol=1e-6)


def test_exr_reinhard_truncation(tmp_path):
    # lib.rs:294-303: x/(1+x), clamp, *255, Rust `as u8` truncation
    hdr = np.array([[[0.0, 1.0, 3.0, 1.0]]], np.float32)
    p = str(tmp_path / "t.exr")
    write_exr(p, hdr)
    w, h, rgba8 = load_exr_image(p)
    assert (w, h) == (1, 1)
    # 1/(1+1)=0.5 -> 127 (truncated, not 128); 3/4=0.75 -> 191
    np.testing.assert_array_equal(rgba8[0, 0], [0, 127, 191, 255])


def test_load_skybox_from_exr(tmp_path):
    hdr = np.ones((4, 8, 4), np.float32)
    p = str(tmp_path / "sky.exr")
    write_exr(p, hdr)
    tex = load_skybox(p)
    assert tex.shape == (4, 8, 4) and tex.dtype == np.float32
    np.testing.assert_allclose(tex[..., 0], 127.0 / 255.0, atol=1e-7)


def test_load_skybox_from_png(tmp_path):
    from PIL import Image

    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (6, 10, 4)).astype(np.uint8)
    p = str(tmp_path / "sky.png")
    Image.fromarray(img, "RGBA").save(p)
    tex = load_skybox(p)
    np.testing.assert_allclose(tex, img.astype(np.float32) / 255.0, atol=1e-7)


def test_procedural_starfield_deterministic():
    a = procedural_starfield(32, 64, seed=5)
    b = procedural_starfield(32, 64, seed=5)
    np.testing.assert_array_equal(a, b)
    c = procedural_starfield(32, 64, seed=6)
    assert not np.array_equal(a, c)
    assert a.dtype == np.uint8 and a.shape == (32, 64, 4)
    assert (a[..., 3] == 255).all()


def test_write_png_pure_roundtrip(tmp_path):
    from PIL import Image

    rng = np.random.RandomState(2)
    img = rng.randint(0, 255, (9, 13, 4)).astype(np.uint8)
    p = str(tmp_path / "pure.png")
    write_png_pure(p, img)
    back = np.asarray(Image.open(p).convert("RGBA"))
    np.testing.assert_array_equal(back, img)


def test_native_writer_roundtrip(tmp_path):
    if not native.available():
        pytest.skip("native library unavailable")
    from PIL import Image

    rng = np.random.RandomState(3)
    img = rng.randint(0, 255, (16, 24, 4)).astype(np.uint8)
    p = str(tmp_path / "nat.png")
    native.write_png(p, img)
    np.testing.assert_array_equal(np.asarray(Image.open(p).convert("RGBA")), img)
    # async pool
    paths = [str(tmp_path / f"a{i}.png") for i in range(4)]
    for q in paths:
        native.submit_frame(q, img)
    assert native.drain() == 0
    for q in paths:
        np.testing.assert_array_equal(np.asarray(Image.open(q).convert("RGBA")), img)


def test_get_image_data_conversions():
    f32 = np.random.RandomState(4).rand(4, 6, 3).astype(np.float32)
    out = get_image_data(f32)
    assert out.shape == (4, 6, 4) and out.dtype == np.uint8
    assert (out[..., 3] == 255).all()
    u8 = (f32 * 255).astype(np.uint8)
    out2 = get_image_data(np.concatenate([u8, np.full((4, 6, 1), 9, np.uint8)], -1))
    np.testing.assert_array_equal(out2[..., 3], 9)


def test_save_image_by_extension(tmp_path):
    img = np.zeros((4, 4, 4), np.uint8)
    img[..., 3] = 255
    for name in ("x.png", "x.jpg", "x.bmp"):
        save_image(img, str(tmp_path / name))
        assert (tmp_path / name).exists()

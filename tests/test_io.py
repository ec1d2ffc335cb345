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


# -- native OpenEXR-backed codec (PIZ / full coverage) ----------------------

needs_native_exr = pytest.mark.skipif(
    not __import__("bhr_tpu.io.native", fromlist=["exr_available"]).exr_available(),
    reason="native OpenEXR support unavailable",
)


@needs_native_exr
def test_piz_roundtrip(tmp_path):
    """PIZ-compressed half EXR (the real star-map format) round-trips
    through the native codec within half precision."""
    from bhr_tpu.io.native import read_exr_native, write_exr_native

    rng = np.random.default_rng(3)
    hdr = (rng.pareto(2.0, (64, 96, 4)) * 0.5).astype(np.float32)
    hdr[..., 3] = 1.0
    p = str(tmp_path / "piz.exr")
    write_exr_native(p, hdr, compression="piz", half=True)
    back = read_exr_native(p)
    assert back.shape == (64, 96, 4)
    half_exact = hdr.astype(np.float16).astype(np.float32)
    np.testing.assert_array_equal(back, half_exact)


@needs_native_exr
def test_piz_large_decode_is_fast(tmp_path):
    """A 4K PIZ star map (the real asset's format and content class)
    decodes in well under the 2 s budget. Uniform noise — PIZ's worst case,
    max-entropy Huffman — is NOT representative: a star map is sparse HDR
    points over a near-black sky."""
    import time

    from bhr_tpu.io.native import read_exr_native, write_exr_native
    from bhr_tpu.io.skybox import procedural_starfield

    hdr = procedural_starfield(2048, 4096, seed=4).astype(np.float32) / 255.0 * 3.0
    p = str(tmp_path / "big_piz.exr")
    write_exr_native(p, hdr, compression="piz", half=True)
    t0 = time.perf_counter()
    back = read_exr_native(p)
    dt = time.perf_counter() - t0
    assert back.shape == (2048, 4096, 4)
    assert dt < 2.0, f"4K PIZ decode took {dt:.2f}s"


@needs_native_exr
def test_python_reader_matches_openexr_zip(tmp_path):
    """Cross-validation: the pure-Python ZIP/ZIPS reader decodes files
    written by the spec implementation (OpenEXR) bit-exactly."""
    from bhr_tpu.io.native import write_exr_native
    from bhr_tpu.io.skybox import read_exr_python

    rng = np.random.default_rng(5)
    hdr = rng.random((37, 53, 4), np.float32)  # odd sizes: partial last block
    for comp, half in (("zip", False), ("zips", False), ("none", False),
                       ("zip", True)):
        p = str(tmp_path / f"x_{comp}_{half}.exr")
        write_exr_native(p, hdr, compression=comp, half=half)
        back = read_exr_python(p)
        want = hdr.astype(np.float16).astype(np.float32) if half else hdr
        np.testing.assert_array_equal(back, want), (comp, half)


@needs_native_exr
def test_native_reads_python_written_exr(tmp_path):
    """And the reverse: OpenEXR decodes files from our pure-Python writer."""
    from bhr_tpu.io.native import read_exr_native

    rng = np.random.default_rng(6)
    hdr = rng.random((16, 24, 4), np.float32)
    p = str(tmp_path / "pyw.exr")
    write_exr(p, hdr)
    np.testing.assert_array_equal(read_exr_native(p), hdr)


@needs_native_exr
def test_load_skybox_from_piz_exr(tmp_path):
    """End-to-end: a PIZ star map loads through load_skybox and renders."""
    from bhr_tpu.io.native import write_exr_native

    rng = np.random.default_rng(7)
    hdr = (rng.random((32, 64, 4)) * 2.0).astype(np.float32)
    hdr[..., 3] = 1.0
    p = str(tmp_path / "sky_piz.exr")
    write_exr_native(p, hdr, compression="piz", half=True)
    tex = load_skybox(p)
    assert tex.shape == (32, 64, 4) and tex.dtype == np.float32
    # Reinhard x/(1+x) then truncate, matching the reference pipeline
    half_vals = hdr[..., :3].astype(np.float16).astype(np.float32)
    want = (np.clip(half_vals / (1.0 + half_vals), 0, 1) * 255).astype(np.uint8)
    np.testing.assert_array_equal((tex[..., :3] * 255).astype(np.uint8), want)

    from bhr_tpu import BlackHoleRenderer

    r = BlackHoleRenderer(16, 8, skybox=p)
    assert r.render_frame().shape == (8, 16, 4)


@needs_native_exr
def test_native_grayscale_exr_replicates_luminance(tmp_path):
    """A Y-only EXR must decode with luminance replicated into R, G, and B
    (regression: the FrameBuffer is keyed by channel name, so inserting
    'Y' three times kept only the blue slice)."""
    from bhr_tpu.io.native import read_exr_native

    rng = np.random.default_rng(8)
    lum = rng.random((12, 20), np.float32)
    p = str(tmp_path / "gray.exr")
    write_exr(p, lum, channels=("Y",))
    back = read_exr_native(p)
    for c in range(3):
        np.testing.assert_array_equal(back[..., c], lum)
    np.testing.assert_array_equal(back[..., 3], 1.0)

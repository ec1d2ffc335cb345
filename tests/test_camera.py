"""Camera basis + ray generation (reference lib.rs:35-59, wgsl:183-198)."""

import jax.numpy as jnp
import numpy as np

from bhr_tpu.core.camera import Camera, generate_rays, orbit_camera


def test_lookat_basis_orthonormal():
    cam = Camera.new([0.0, 5.0, 15.0], [0.0, 0.0, 0.0], [0.0, 1.0, 0.0])
    f, r, u = map(np.asarray, (cam.forward, cam.right, cam.up))
    for v in (f, r, u):
        np.testing.assert_allclose(np.linalg.norm(v), 1.0, rtol=1e-6)
    assert abs(np.dot(f, r)) < 1e-6
    assert abs(np.dot(f, u)) < 1e-6
    assert abs(np.dot(r, u)) < 1e-6
    # right = forward x up (right-handed, lib.rs:44)
    np.testing.assert_allclose(np.cross(f, u), r, atol=1e-6)


def test_lookat_default_pose():
    # camera at (0,5,15) looking at origin: forward points down -Z and -Y
    cam = Camera.default()
    f = np.asarray(cam.forward)
    assert f[2] < 0 and f[1] < 0 and abs(f[0]) < 1e-7
    # right should be +X-ish (cross of forward with +Y up)
    assert np.asarray(cam.right)[0] > 0.99


def test_ray_directions_center_and_corners():
    w, h, fov = 64, 48, np.pi / 3
    cam = Camera.new([0.0, 0.0, 10.0], [0.0, 0.0, 0.0], [0.0, 1.0, 0.0])
    _, d = generate_rays(cam, w, h, fov)
    d = np.asarray(d)
    assert d.shape == (h, w, 3)
    # all unit length
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, rtol=1e-5)
    # wgsl uses pixel-index UVs: pixel (0,0) maps to exactly u=-1,v=+1
    ff = np.tan(fov / 2)
    aspect = w / h
    expect = np.array([-1.0 * aspect * ff * 1.0, 1.0 * ff, -1.0])  # right=+x?, up=+y
    # forward is -Z; right = forward x up = (-Z) x (+Y) = +X... verify via camera
    f, r, u = map(np.asarray, (cam.forward, cam.right, cam.up))
    expect = f + r * (-1.0 * aspect) * ff + u * (1.0 * ff)
    expect /= np.linalg.norm(expect)
    np.testing.assert_allclose(d[0, 0], expect, atol=1e-6)


def test_y_flip():
    # top rows (small y index) must have larger world-up component (wgsl:185)
    cam = Camera.new([0.0, 0.0, 10.0], [0.0, 0.0, 0.0], [0.0, 1.0, 0.0])
    _, d = generate_rays(cam, 32, 32, np.pi / 3)
    d = np.asarray(d)
    assert d[0, 16, 1] > d[-1, 16, 1]


def test_ray_offsets_consistent_with_full():
    """Band ray-gen (sharded path) matches the same rows of the full image."""
    cam = Camera.default()
    w, h, fov = 40, 32, np.pi / 3
    _, full = generate_rays(cam, w, h, fov)
    _, band = generate_rays(cam, w, h, fov, row_offset=8, local_shape=(8, w))
    np.testing.assert_array_equal(np.asarray(full)[8:16], np.asarray(band))


def test_orbit_camera_matches_reference_params():
    # main.rs:851-869: angle = t*0.3, pos = (15cos, 5, 15sin), look at origin
    t = 2.0
    cam = orbit_camera(t)
    pos = np.asarray(cam.position)
    np.testing.assert_allclose(
        pos, [15 * np.cos(0.6), 5.0, 15 * np.sin(0.6)], rtol=1e-5
    )
    # forward points at the origin
    np.testing.assert_allclose(
        np.asarray(cam.forward), -pos / np.linalg.norm(pos), atol=1e-6
    )


def test_orbit_camera_deterministic_resume():
    # animation is a pure function of t — same t, same camera (resume support)
    c1, c2 = orbit_camera(5.0), orbit_camera(5.0)
    np.testing.assert_array_equal(np.asarray(c1.position), np.asarray(c2.position))

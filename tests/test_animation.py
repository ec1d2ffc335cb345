"""Animation: fused scan correctness, determinism, resume-by-frame-index
(the reference's animation is a pure function of t, main.rs:851-869)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from bhr_tpu import BlackHoleRenderer, SceneParams, orbit_camera
from bhr_tpu.animation import APP_MAX_STEPS, OrbitAnimator, PathAnimator

SCENE = dict(screen_width=32, screen_height=16, max_steps=40)


def _make():
    r = BlackHoleRenderer(32, 16)
    return r, OrbitAnimator(r), SceneParams(**SCENE)


def test_app_max_steps_matches_reference():
    assert APP_MAX_STEPS == 200  # main.rs:878


def test_scan_matches_per_frame_renders():
    r, anim, scene = _make()
    frames = np.asarray(anim.render_frames(3, fps=60.0, scene=scene))
    for i in range(3):
        single = np.asarray(r.render_frame(orbit_camera(i / 60.0), scene))
        np.testing.assert_array_equal(frames[i], single)


def test_resume_by_start_frame_bit_exact():
    _, anim, scene = _make()
    full = np.asarray(anim.render_frames(6, fps=60.0, scene=scene))
    tail = np.asarray(anim.render_frames(3, fps=60.0, start_frame=3, scene=scene))
    np.testing.assert_array_equal(full[3:], tail)


def test_packed_and_unpacked_agree():
    _, anim, scene = _make()
    u8 = np.asarray(anim.render_frames(2, scene=scene))
    packed = np.asarray(anim.render_frames(2, scene=scene, packed=True))
    view = packed.view(np.uint8).reshape(2, 16, 32, 4)
    np.testing.assert_array_equal(u8, view)


def test_render_to_dir_writes_sequence(tmp_path):
    _, anim, scene = _make()
    paths = anim.render_to_dir(str(tmp_path), 5, fps=60.0, chunk_size=2, scene=scene)
    assert len(paths) == 5
    assert sorted(os.listdir(tmp_path)) == [
        f"frame_{i:05d}.png" for i in range(5)
    ] + ["manifest.json"]
    from PIL import Image

    img = np.asarray(Image.open(paths[0]).convert("RGBA"))
    direct = np.asarray(_make()[0].render_frame(orbit_camera(0.0), scene))
    np.testing.assert_array_equal(img, direct)


def test_render_to_dir_resume_skips_existing(tmp_path):
    _, anim, scene = _make()
    anim.render_to_dir(str(tmp_path), 3, fps=60.0, chunk_size=2, scene=scene)
    first = {p: os.path.getmtime(os.path.join(tmp_path, p)) for p in os.listdir(tmp_path)}
    # resume to 6 frames: the first 3 are not re-rendered
    paths = anim.render_to_dir(
        str(tmp_path), 6, fps=60.0, chunk_size=2, scene=scene, resume=True
    )
    assert len(paths) == 6
    assert len(os.listdir(tmp_path)) == 7  # 6 frames + manifest.json
    for name, mtime in first.items():
        if name == "manifest.json":
            continue  # rewritten (same content) on every run
        assert os.path.getmtime(os.path.join(tmp_path, name)) == mtime
    # resumed tail matches a fresh full render bit-exactly
    import numpy as np
    from PIL import Image

    fresh = np.asarray(anim.render_frames(6, fps=60.0, scene=scene))
    got = np.asarray(Image.open(os.path.join(tmp_path, "frame_00005.png")).convert("RGBA"))
    np.testing.assert_array_equal(got, fresh[5])


def test_render_to_dir_manifest_guards_resume(tmp_path):
    """Resuming under a different render configuration must raise, not
    silently mix frames (manifest.json sidecar)."""
    import json

    import pytest

    _, anim, scene = _make()
    anim.render_to_dir(str(tmp_path), 2, fps=60.0, chunk_size=2, scene=scene)
    manifest = json.load(open(tmp_path / "manifest.json"))
    assert manifest["max_steps"] == SCENE["max_steps"]
    assert manifest["camera_path"].startswith("orbit:")
    other = SceneParams(**{**SCENE, "max_steps": 80})
    with pytest.raises(ValueError, match="max_steps"):
        anim.render_to_dir(
            str(tmp_path), 4, fps=60.0, chunk_size=2, scene=other, resume=True
        )
    # a fresh (non-resume) run may overwrite freely
    anim.render_to_dir(str(tmp_path), 2, fps=60.0, chunk_size=2, scene=other)
    assert json.load(open(tmp_path / "manifest.json"))["max_steps"] == 80


def test_save_gif(tmp_path):
    _, anim, scene = _make()
    p = str(tmp_path / "orbit.gif")
    anim.save_gif(p, 3, fps=30.0, scene=scene)
    from PIL import Image

    g = Image.open(p)
    assert g.n_frames == 3


def test_path_animator_custom_camera():
    from bhr_tpu import Camera

    r = BlackHoleRenderer(32, 16)
    scene = SceneParams(**SCENE)

    def flyin(t):
        pos = jnp.stack([15.0 - t * 2.0, jnp.zeros_like(t) + 5.0, jnp.zeros_like(t)])
        return Camera.new(pos, jnp.zeros(3), jnp.asarray([0.0, 1.0, 0.0]))

    frames = np.asarray(PathAnimator(r, flyin).render_frames(3, fps=60.0, scene=scene))
    assert frames.shape == (3, 16, 32, 4)
    # frame 0 must equal a direct render from the same camera
    direct = np.asarray(r.render_frame(flyin(jnp.float32(0.0)), scene))
    np.testing.assert_array_equal(frames[0], direct)

"""MJPEG/AVI video export (io/video.py)."""

import numpy as np

from bhr_tpu import BlackHoleRenderer, SceneParams
from bhr_tpu.animation import OrbitAnimator
from bhr_tpu.io.video import read_avi_info, write_mjpeg_avi


def test_avi_container_structure(tmp_path):
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 255, (5, 32, 48, 4)).astype(np.uint8)
    frames[..., 3] = 255
    p = str(tmp_path / "clip.avi")
    write_mjpeg_avi(p, frames, fps=24.0)
    info = read_avi_info(p)
    assert info["frames"] == 5
    assert (info["width"], info["height"]) == (48, 32)
    assert info["codec"] == "MJPG"
    assert abs(info["fps"] - 24.0) < 0.1
    # each frame decodes as a valid JPEG
    import io as _io

    from PIL import Image

    data = open(p, "rb").read()
    pos, count = 0, 0
    while True:
        i = data.find(b"00dc", pos + 1)
        if i < 0 or i > data.find(b"idx1"):
            break
        size = int.from_bytes(data[i + 4 : i + 8], "little")
        payload = data[i + 8 : i + 8 + size]
        if payload[:2] == b"\xff\xd8":  # movi chunk (idx entries have offsets)
            img = Image.open(_io.BytesIO(payload))
            assert img.size == (48, 32)
            count += 1
        pos = i
    assert count == 5


def test_animator_save_video(tmp_path):
    r = BlackHoleRenderer(32, 16)
    scene = SceneParams(screen_width=32, screen_height=16, max_steps=20)
    p = str(tmp_path / "orbit.avi")
    OrbitAnimator(r).save_video(p, 3, fps=12.0, scene=scene)
    info = read_avi_info(p)
    assert info["frames"] == 3 and info["width"] == 32

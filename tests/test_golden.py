"""Golden-image regression tests (the golden-diff strategy of SURVEY.md §4:
the BASELINE '256x256 ... PNG out, diff vs reference render' config scaled
to CI size).

Goldens were rendered by the XLA oracle on CPU and are compared with a
small tolerance: XLA version changes can shift fp contraction by ~1 ulp,
which the chaotic shadow boundary amplifies for a handful of pixels.
"""

import os

import numpy as np
import pytest

from bhr_tpu import BlackHoleRenderer, Camera, SceneParams

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _compare(frame, name, max_bad_frac=0.005, tol=1):
    from PIL import Image

    golden = np.asarray(
        Image.open(os.path.join(GOLDEN_DIR, name)).convert("RGBA"), dtype=np.int32
    )
    got = np.asarray(frame, dtype=np.int32)
    assert got.shape == golden.shape
    diff = np.abs(got - golden).max(axis=-1)
    bad = (diff > tol).mean()
    assert bad <= max_bad_frac, (
        f"{name}: {bad:.4%} of pixels differ by more than {tol} levels "
        f"(max diff {diff.max()})"
    )


def test_golden_schwarzschild():
    r = BlackHoleRenderer(64, 64, use_pallas=False)
    cam = Camera.new([15.0, 5.0, 0.0], [0.0, 0.0, 0.0], [0.0, 1.0, 0.0])
    scene = SceneParams(screen_width=64, screen_height=64, max_steps=300)
    _compare(r.render_frame(cam, scene), "schwarzschild_64.png")


def test_golden_schwarzschild_pallas_path():
    r = BlackHoleRenderer(64, 64, use_pallas=True)
    cam = Camera.new([15.0, 5.0, 0.0], [0.0, 0.0, 0.0], [0.0, 1.0, 0.0])
    scene = SceneParams(screen_width=64, screen_height=64, max_steps=300)
    _compare(r.render_frame(cam, scene), "schwarzschild_64.png")


def test_golden_disk():
    r = BlackHoleRenderer(64, 64, use_pallas=False, disk=True)
    cam = Camera.new([0.0, 3.0, 20.0], [0.0, 0.0, 0.0], [0.0, 1.0, 0.0])
    scene = SceneParams(screen_width=64, screen_height=64, max_steps=400)
    _compare(r.render_frame(cam, scene), "disk_64.png")

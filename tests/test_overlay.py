"""Perf overlay + legend (the egui GUI analog, reference main.rs:587-826)."""

import numpy as np

from bhr_tpu.utils.overlay import (
    draw_legend,
    draw_legend_onto,
    draw_performance_overlay,
)
from bhr_tpu.utils.perf import PerformanceStats


def _frame(h=120, w=160):
    f = np.zeros((h, w, 4), np.uint8)
    f[..., 3] = 255
    return f


def test_performance_overlay_draws_panel():
    s = PerformanceStats()
    s.warmup_frames_remaining = 0
    s.update_frame_time()
    s.update_frame_time()
    s.update_cpu_time(3.0)
    s.update_gpu_time(5.0)
    out = draw_performance_overlay(_frame(), s)
    assert out.shape == (120, 160, 4)
    # panel region changed from the black input
    assert out[10:60, 10:60, :3].sum() > 0
    # untouched far corner stays black
    assert out[-10:, -10:, :3].sum() == 0


def test_legend_gradient_orientation():
    leg = draw_legend(height=100, max_steps=200)
    assert leg.shape == (100, 46, 4)
    top = leg[2, 4, :3].astype(int)  # max steps -> red
    bot = leg[97, 4, :3].astype(int)  # 0 steps -> blue
    assert top[0] > 200 and top[2] < 60
    assert bot[2] > 200 and bot[0] < 60


def test_legend_composited_top_right():
    out = draw_legend_onto(_frame(), max_steps=100)
    assert out[10, -20, :3].sum() > 0  # legend pixels present
    assert out[-10, 10, :3].sum() == 0  # rest untouched


def test_cli_overlay_flag(tmp_path, monkeypatch):
    import os

    from bhr_tpu.app import main

    monkeypatch.chdir(tmp_path)
    out = str(tmp_path / "ov")
    rc = main(
        ["--frames", "1", "--width", "64", "--height", "48", "--max-steps", "10",
         "--out", out, "--overlay", "--debug-steps", "--oracle"]
    )
    assert rc == 0
    from PIL import Image

    img = np.asarray(Image.open(os.path.join(out, "frame_00000.png")))
    assert img.shape == (48, 64, 4)

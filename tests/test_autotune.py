"""Autotuner: candidate selection, caching, off-TPU fallback."""

import json

import jax

from bhr_tpu.ops.pallas_trace import pick_tile
from bhr_tpu.utils.autotune import _default_candidates, autotune


def test_off_tpu_returns_static_defaults(tmp_path):
    cfg = autotune(1920, 1080, 500, cache_path=str(tmp_path / "c.json"))
    assert tuple(cfg["tile"]) == pick_tile(1920)
    assert cfg["ms_per_frame"] is None  # nothing measured on CPU


def test_measure_injection_and_cache(tmp_path):
    calls = []

    def fake_measure(w, h, steps, cand):
        calls.append(cand)
        # pretend (8, 512) with eee=0 is fastest
        return 10.0 if cand == {"tile": (8, 512), "early_exit_every": 0} else 20.0

    cache = str(tmp_path / "c.json")
    best = autotune(1024, 512, 100, cache_path=cache, measure_fn=fake_measure)
    assert best["tile"] == [8, 512]
    assert best["early_exit_every"] == 0
    assert best["ms_per_frame"] == 10.0
    assert len(calls) == len(_default_candidates(1024))
    # cached: second call measures nothing
    calls.clear()
    again = autotune(1024, 512, 100, cache_path=cache, measure_fn=fake_measure)
    assert again == best and calls == []
    # force re-measures
    autotune(1024, 512, 100, cache_path=cache, measure_fn=fake_measure, force=True)
    assert calls
    # cache file is valid json keyed by device/config
    blob = json.load(open(cache))
    assert any("1024x512" in k for k in blob)


def test_failing_candidates_skipped(tmp_path):
    def flaky(w, h, steps, cand):
        if cand["early_exit_every"] == 0:
            raise RuntimeError("compile boom")
        return 5.0

    best = autotune(640, 320, 50, cache_path=str(tmp_path / "c.json"), measure_fn=flaky)
    assert best["early_exit_every"] == 64
    assert best["ms_per_frame"] == 5.0

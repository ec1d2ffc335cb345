"""Autotuner: staged candidate search, caching, off-TPU fallback."""

import json

import jax

from bhr_tpu.ops.pallas_trace import pick_tile
from bhr_tpu.utils.autotune import (
    _knob_candidates,
    _tile_candidates,
    autotune,
    load_tuned,
)


def test_off_tpu_returns_static_defaults(tmp_path):
    cfg = autotune(1920, 1080, 500, cache_path=str(tmp_path / "c.json"))
    assert tuple(cfg["tile"]) == pick_tile(1920)
    assert cfg["ms_per_frame"] is None  # nothing measured on CPU
    assert cfg["steps_per_check"] == 1 and cfg["unroll"] == 1


def test_staged_search_measures_tiles_then_knobs(tmp_path):
    calls = []

    def fake_measure(w, h, steps, cand):
        calls.append(dict(cand))
        # (8, 512) wins the tile stage; eee=0 + spc=2 wins the knob stage
        if tuple(cand["tile"]) != (8, 512):
            return 20.0
        if cand.get("early_exit_every") == 0 and cand.get("steps_per_check") == 2:
            return 8.0
        return 10.0

    cache = str(tmp_path / "c.json")
    best = autotune(1024, 512, 100, cache_path=cache, measure_fn=fake_measure)
    assert best["tile"] == [8, 512]
    assert best["early_exit_every"] == 0
    assert best["steps_per_check"] == 2
    assert best["ms_per_frame"] == 8.0
    # stage 3 re-tries the non-winning tiles with the winning knobs,
    # re-exploring the linear axis where the tile pads the width
    # (1 retry per dividing width, 2 for padded widths)
    n_stage3 = sum(
        1 if 1024 % c["tile"][1] == 0 else 2
        for c in _tile_candidates(1024)
        if tuple(c["tile"]) != (8, 512)
    )
    n_expected = (
        len(_tile_candidates(1024))
        + len(_knob_candidates((8, 512), 100))
        + n_stage3
    )
    assert len(calls) == n_expected
    # the stage-3 retries carry the stage-2 winning loop structure
    retries = calls[-n_stage3:]
    assert all(
        c["early_exit_every"] == 0 and c["steps_per_check"] == 2 for c in retries
    )
    assert all(tuple(c["tile"]) != (8, 512) for c in retries)
    assert any(c["linear"] for c in retries)  # padded tiles retried linear too
    # cached: second call measures nothing
    calls.clear()
    again = autotune(1024, 512, 100, cache_path=cache, measure_fn=fake_measure)
    assert again == best and calls == []
    # force re-measures
    autotune(1024, 512, 100, cache_path=cache, measure_fn=fake_measure, force=True)
    assert calls
    # cache file is valid json keyed by device/config, readable by load_tuned
    blob = json.load(open(cache))
    assert any("1024x512" in k for k in blob)
    assert load_tuned(1024, 512, 100, cache_path=cache) == best
    assert load_tuned(9999, 1, 1, cache_path=cache) is None


def test_knob_candidates_respect_divisibility():
    # max_steps=100: spc=4 incompatible with eee=64 (100 % 64 != 0) but
    # fine with eee=0; spc must divide max_steps
    cands = _knob_candidates((8, 640), 100)
    for c in cands:
        spc = c["steps_per_check"]
        assert 100 % spc == 0
        if spc > 1 and c["early_exit_every"]:
            assert c["early_exit_every"] % spc == 0
            assert 100 % c["early_exit_every"] == 0


def test_failing_candidates_skipped(tmp_path):
    def flaky(w, h, steps, cand):
        if cand["early_exit_every"] == 0:
            raise RuntimeError("compile boom")
        return 5.0

    best = autotune(640, 320, 50, cache_path=str(tmp_path / "c.json"), measure_fn=flaky)
    assert best["early_exit_every"] == 64
    assert best["ms_per_frame"] == 5.0

"""Perf subsystem (reference main.rs:36-262): warmup exclusion, rolling
stats, exact CSV schema."""

import csv
import os
import time

from bhr_tpu.utils.perf import CSV_HEADER, PerfLogger, PerformanceStats
from bhr_tpu.utils.timing import TimestampQuery, time_fn


def test_warmup_frames_excluded():
    s = PerformanceStats()
    for _ in range(10):  # warm-up (main.rs:77: first 10 frames)
        s.update_frame_time()
    assert len(s.frame_times) == 0
    assert s.current_fps == 0.0
    s.update_frame_time()
    assert len(s.frame_times) == 1


def test_rolling_window_capped():
    s = PerformanceStats(max_samples=5)
    s.warmup_frames_remaining = 0
    for _ in range(12):
        s.update_frame_time()
    assert len(s.frame_times) == 5


def test_min_max_all_time():
    s = PerformanceStats()
    s.warmup_frames_remaining = 0
    s.update_frame_time()
    time.sleep(0.01)
    s.update_frame_time()
    time.sleep(0.002)
    s.update_frame_time()
    assert s.min_fps() <= s.max_fps()
    assert s.max_fps() > 0


def test_stats_formulas():
    s = PerformanceStats()
    s.frame_times.extend([10.0, 20.0])  # ms
    assert abs(s.avg_fps() - 1000.0 / 15.0) < 1e-9
    assert abs(s.std_dev_fps() - 5.0) < 1e-9  # population std of frame times
    s.cpu_times.extend([1.0, 3.0])
    assert s.avg_cpu_time() == 2.0
    s.gpu_times.extend([2.0, 4.0])
    assert s.avg_gpu_time() == 3.0


def test_empty_stats_are_zero():
    s = PerformanceStats()
    assert s.avg_fps() == 0.0
    assert s.min_fps() == 0.0  # inf sentinel -> 0 (main.rs:153-159)
    assert s.std_dev_fps() == 0.0


def test_perflogger_schema_and_rows(tmp_path):
    logger = PerfLogger("testtag", directory=str(tmp_path))
    s = PerformanceStats()
    s.warmup_frames_remaining = 0
    s.update_frame_time()
    s.update_frame_time()
    s.update_cpu_time(1.5)
    s.update_gpu_time(2.5)
    logger.log_frame(s)
    logger.log_frame(s)
    logger.close()
    # filename pattern perf_log_<tag>_<timestamp>.csv (main.rs:211-212)
    name = os.path.basename(logger.filename)
    assert name.startswith("perf_log_testtag_") and name.endswith(".csv")
    with open(logger.filename) as f:
        rows = list(csv.reader(f))
    assert rows[0] == CSV_HEADER  # exact 12-column schema (main.rs:217-230)
    assert len(rows) == 3
    assert rows[1][1] == "testtag"
    assert float(rows[1][5]) == 2.5  # gpu_time_ms column


def test_timestamp_query_lifecycle():
    q = TimestampQuery()
    assert q.gpu_time_ms is None
    q.begin()
    q.end()
    assert q.gpu_time_ms is not None and q.gpu_time_ms >= 0.0


def test_time_fn_median():
    import jax.numpy as jnp

    ms = time_fn(lambda x: x + 1, jnp.ones(8), warmup=1, iters=3)
    assert ms >= 0.0


def test_cpu_gpu_times_are_warmup_gated():
    """Compile-frame contamination regression: cpu/gpu samples recorded
    during the warm-up window must be discarded (main.rs:77-94 analog)."""
    from bhr_tpu.utils.perf import WARMUP_FRAMES, PerformanceStats

    s = PerformanceStats()
    for i in range(WARMUP_FRAMES):
        s.record_frame_time_ms(1000.0)  # "compile" frames
        s.update_cpu_time(2500.0)
        s.update_gpu_time(2500.0)
    assert s.avg_cpu_time() == 0.0 and s.avg_gpu_time() == 0.0
    assert len(s.frame_times) == 0
    s.record_frame_time_ms(5.0)
    s.update_cpu_time(1.0)
    s.update_gpu_time(4.0)
    assert s.avg_cpu_time() == 1.0
    assert s.avg_gpu_time() == 4.0
    assert list(s.frame_times) == [5.0]


def test_timestamp_query_subtracts_overhead():
    import time as _time

    from bhr_tpu.utils.timing import TimestampQuery

    q = TimestampQuery(overhead_ms=1e6)  # absurd overhead -> floored at 0
    q.begin()
    _time.sleep(0.001)
    q.end()
    assert q.gpu_time_ms == 0.0
    q2 = TimestampQuery()
    q2.begin()
    _time.sleep(0.005)
    q2.end()
    assert q2.gpu_time_ms >= 4.0


def test_calibrate_dispatch_overhead_runs():
    from bhr_tpu.utils.timing import calibrate_dispatch_overhead_ms

    ms = calibrate_dispatch_overhead_ms(reps=3)
    assert 0.0 <= ms < 10_000.0

"""Device timing: the analog of wgpu timestamp queries.

The reference wraps its compute pass in GPU timestamp writes and reads the
previous frame's pair each frame (reference: src/main.rs:510-531, 887-921;
src/lib.rs:569-577). On TPU, device time is measured by bracketing a
dispatch with block_until_ready — TimestampQuery mirrors the query-set
object the reference passes into render_frame, and `jax.profiler` hooks
provide deep traces when needed.
"""

from __future__ import annotations

import contextlib
import time

import jax


class TimestampQuery:
    """Populated by BlackHoleRenderer.render_frame(..., timestamp_query=q).

    Semantics note: unlike the wgpu pass-only timestamps, this measures
    dispatch + completion from the host (it forces a sync). The reference
    app also syncs each frame for its readback (main.rs:890), so frame
    pacing is comparable.
    """

    def __init__(self):
        self.gpu_time_ms: float | None = None
        self._t0: float | None = None

    def begin(self) -> None:
        self._t0 = time.perf_counter()

    def end(self) -> None:
        if self._t0 is not None:
            self.gpu_time_ms = (time.perf_counter() - self._t0) * 1000.0


def time_fn(fn, *args, warmup: int = 3, iters: int = 10) -> float:
    """Median wall time (ms) of a jitted callable, synchronized per call.

    Caveat for remote-executor environments (e.g. the axon tunnel): results
    of identical-content dispatches may be served from a cache, making
    repeats spuriously fast — vary the inputs per call there, or use the
    fused-scan slope protocol (see bench.py / utils/autotune.py).
    """
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append((time.perf_counter() - t0) * 1000.0)
    times.sort()
    return times[len(times) // 2]


@contextlib.contextmanager
def profiler_trace(logdir: str):
    """jax.profiler trace context (TPU equivalent of the CSV+timestamp
    tooling for deep dives)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

"""On-device kernel autotuning.

pick_tile() encodes v5e measurements; other TPU generations (or future
compiler versions) may prefer different tile widths / early-exit cadences.
The autotuner measures a small candidate grid on the actual device using
the fused-scan slope protocol (two scan lengths, fresh frame times per
timed call — the only timing method that survives this environment's
dispatch overhead and result caching; see docs/DESIGN.md) and caches the
winner per (device kind, width, height, max_steps, fast_math) in a JSON
sidecar.

Usage:
    from bhr_tpu.utils.autotune import autotune
    best = autotune(1920, 1080, 500)          # {'tile': [8, 640], ...}
    renderer = BlackHoleRenderer(1920, 1080, fast_math=True,
                                 tile=tuple(best["tile"]))
"""

from __future__ import annotations

import json
import logging
import os
import time

import jax
import jax.numpy as jnp

from ..ops.pallas_trace import DEFAULT_EARLY_EXIT_EVERY, pick_tile

logger = logging.getLogger("bhr_tpu")

DEFAULT_CACHE = ".bhr_autotune.json"


def _default_candidates(width: int):
    tiles = [(8, tw) for tw in (256, 384, 512, 640) if tw <= max(width, 256)]
    eees = [0, 64]
    return [
        {"tile": t, "early_exit_every": e} for t in tiles for e in eees
    ]


def _measure_candidate(width, height, max_steps, cand, n1=2, n2=8, fast_math=True):
    """Slope ms/frame for one candidate config on the current device.

    Returns a non-positive number when dispatch-time noise swamps the
    measurement (short scan slower than long scan); callers must discard
    such samples.
    """
    from ..core.camera import orbit_camera
    from ..core.scene import SceneParams
    from ..ops.pallas_trace import pallas_render_packed, pallas_trace_image
    from ..ops.trace import TraceConfig

    scene = SceneParams(
        screen_width=width, screen_height=height, max_steps=max_steps
    )

    def one(c, t):
        if fast_math:
            out = pallas_render_packed(
                orbit_camera(t),
                scene,
                TraceConfig(),
                tile=tuple(cand["tile"]),
                early_exit_every=cand["early_exit_every"],
                interpret=False,
            )
        else:
            res = pallas_trace_image(
                orbit_camera(t),
                scene,
                TraceConfig(),
                tile=tuple(cand["tile"]),
                early_exit_every=cand["early_exit_every"],
                fast_math=False,
                interpret=False,
            )
            out = res.final_vel.sum()
        return c, out

    f = jax.jit(lambda ts: jax.lax.scan(one, 0, ts)[1])
    base = time.time() % 100000.0

    def fresh(n, k):
        return jnp.arange(n, dtype=jnp.float32) / 60.0 + jnp.float32(base + 97.0 * k)

    jax.block_until_ready(f(fresh(n1, 0)))
    jax.block_until_ready(f(fresh(n2, 1)))
    t0 = time.perf_counter()
    jax.block_until_ready(f(fresh(n1, 2)))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(f(fresh(n2, 3)))
    t2 = time.perf_counter() - t0
    return (t2 - t1) / (n2 - n1) * 1000.0


def autotune(
    width: int,
    height: int,
    max_steps: int = 500,
    *,
    fast_math: bool = True,
    candidates=None,
    cache_path: str = DEFAULT_CACHE,
    force: bool = False,
    measure_fn=_measure_candidate,
) -> dict:
    """Return the best {'tile', 'early_exit_every', 'ms_per_frame'} config.

    Off-TPU (CPU/interpret) measurement is meaningless — returns the static
    pick_tile() defaults immediately. Results are cached in `cache_path`.
    """
    device_kind = jax.devices()[0].device_kind
    key = f"{device_kind}|{width}x{height}|steps={max_steps}|fast={fast_math}"
    cache = {}
    if os.path.exists(cache_path):
        try:
            cache = json.load(open(cache_path))
        except (OSError, json.JSONDecodeError):
            cache = {}
    if not force and key in cache:
        return cache[key]

    default = {
        "tile": list(pick_tile(width)),
        "early_exit_every": DEFAULT_EARLY_EXIT_EVERY,
        "ms_per_frame": None,
    }
    if jax.default_backend() != "tpu" and measure_fn is _measure_candidate:
        return default

    best = None
    for cand in candidates or _default_candidates(width):
        try:
            if measure_fn is _measure_candidate:
                ms = measure_fn(width, height, max_steps, cand, fast_math=fast_math)
            else:
                ms = measure_fn(width, height, max_steps, cand)
        except Exception as e:  # a candidate failing to compile is not fatal
            logger.warning("autotune candidate %s failed: %s", cand, e)
            continue
        if ms <= 0.0:  # dispatch-noise-corrupted slope: unusable sample
            logger.warning("autotune candidate %s: noisy slope %.2f, skipped", cand, ms)
            continue
        logger.info("autotune %s: %.2f ms/frame", cand, ms)
        if best is None or ms < best["ms_per_frame"]:
            best = {**cand, "tile": list(cand["tile"]), "ms_per_frame": round(ms, 3)}
    result = best or default
    cache[key] = result
    try:
        with open(cache_path, "w") as f:
            json.dump(cache, f, indent=1)
    except OSError:
        pass
    return result

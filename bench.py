#!/usr/bin/env python
"""Headline benchmark: 1920x1080, max_steps=500 Schwarzschild frame.

Matches the driver BASELINE.json target config ("1920x1080 ... max_steps=500
in <=16 ms/frame on one v5e chip"). Frames are timed through the fused
lax.scan animation path (the honest analog of the reference's continuous
animation loop, main.rs:1110-1131) so per-dispatch tunnel latency does not
pollute the per-frame number.

Prints ONE JSON line:
  {"metric": ..., "value": <ms/frame>, "unit": "ms", "vs_baseline": <16/ms>}

vs_baseline > 1.0 means faster than the 16 ms/frame target.

Env knobs: BHR_BENCH_W/H/STEPS/FRAMES/TILE (e.g. TILE=8x512),
BHR_BENCH_FAST=1 (fast-math kernel), BHR_BENCH_ORACLE=1 (XLA path).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp


def main():
    width = int(os.environ.get("BHR_BENCH_W", 1920))
    height = int(os.environ.get("BHR_BENCH_H", 1080))
    max_steps = int(os.environ.get("BHR_BENCH_STEPS", 500))
    n_frames = int(os.environ.get("BHR_BENCH_FRAMES", 240))
    tile_env = os.environ.get("BHR_BENCH_TILE")
    tile = tuple(int(x) for x in tile_env.split("x")) if tile_env else None
    fast_math = os.environ.get("BHR_BENCH_FAST", "1") == "1"
    use_pallas = os.environ.get("BHR_BENCH_ORACLE", "0") != "1"

    from bhr_tpu import BlackHoleRenderer, SceneParams
    from bhr_tpu.animation import OrbitAnimator

    renderer = BlackHoleRenderer(
        width, height, use_pallas=use_pallas, tile=tile, fast_math=fast_math
    )
    scene = SceneParams(
        screen_width=width, screen_height=height, max_steps=max_steps
    )
    anim = OrbitAnimator(renderer)

    # Warm up at the SAME scan length so the timed call is compile-free,
    # but with different frame times so the remote executor's result cache
    # cannot serve it. Frames stay in the packed-u32 device format; the
    # uint8 RGBA view is a free numpy reinterpret on the host.
    frames = anim.render_frames(n_frames, fps=60.0, start_frame=0, scene=scene, packed=True)
    jax.block_until_ready(frames)
    _ = jax.device_get(frames[0, 0, 0])

    t0 = time.perf_counter()
    frames = anim.render_frames(
        n_frames, fps=60.0, start_frame=n_frames, scene=scene, packed=True
    )
    jax.block_until_ready(frames)
    elapsed = time.perf_counter() - t0

    ms_per_frame = elapsed / n_frames * 1000.0
    # throughput with the workload's step bound (BASELINE.md derivation)
    mray_steps = width * height * max_steps / (ms_per_frame / 1000.0) / 1e6
    target_ms = 16.0
    print(
        json.dumps(
            {
                "metric": f"ms_per_frame_{width}x{height}_steps{max_steps}",
                "value": round(ms_per_frame, 3),
                "unit": "ms",
                "vs_baseline": round(target_ms / ms_per_frame, 3),
                "mray_steps_per_sec": round(mray_steps, 1),
                "frames": n_frames,
                "backend": jax.default_backend(),
                "tile": list(renderer.tile),
                "fast_math": fast_math,
                "pallas": use_pallas,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

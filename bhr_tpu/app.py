"""Application mode: the headless real-time animation loop + CLI.

The analog of the reference's windowed winit app (reference: src/main.rs).
There is no display surface on a TPU host, so "application mode" renders
the same orbiting-camera animation headlessly — frames stream to a PNG
sequence via the native async writer instead of a swapchain — while
reproducing the app-mode behaviors:

  * CLI flags --perf-log / --duration / --debug-steps (main.rs:14-32);
    --shader becomes --integrator/--model (the kernel-selection axis);
  * orbit camera angle = t*0.3, radius 15, height 5 (main.rs:851-869);
  * per-frame scene with max_steps=200 (main.rs:878);
  * PerformanceStats with 10-frame warmup + CSV PerfLogger (main.rs:36-262);
  * benchmark auto-exit after --duration seconds (main.rs:836-848).
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import numpy as np

from .animation import APP_MAX_STEPS
from .core.camera import orbit_camera
from .core.scene import DEBUG_NONE, DEBUG_STEPS, SceneParams
from .renderer import BlackHoleRenderer
from .utils.perf import PerfLogger, PerformanceStats
from .utils.timing import TimestampQuery


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="bhr-tpu",
        description="TPU-native black hole raytracer (animation/benchmark mode)",
    )
    # reference flags (main.rs:14-32)
    p.add_argument("--perf-log", metavar="TAG", help="record a performance CSV with this version tag")
    p.add_argument("--duration", type=float, metavar="SECONDS", help="auto-exit after N seconds (benchmarking)")
    p.add_argument("--debug-steps", action="store_true", help="step-count heatmap debug mode")
    p.add_argument("--integrator", default="euler", choices=["euler", "rk4"],
                   help="geodesic integrator (replaces the reference --shader hot-swap)")
    # TPU-native extensions
    p.add_argument("--model", default="schwarzschild", choices=["schwarzschild", "kerr", "flat"])
    p.add_argument("--spin", type=float, default=0.9, help="Kerr spin a/M (used with --model kerr)")
    p.add_argument("--adaptive", action="store_true", help="adaptive step size")
    p.add_argument("--disk", action="store_true", help="render the accretion disk")
    p.add_argument("--width", type=int, default=800)
    p.add_argument("--height", type=int, default=600)
    p.add_argument("--max-steps", type=int, default=APP_MAX_STEPS)
    p.add_argument("--frames", type=int, default=0, help="stop after N frames (0 = until --duration/Ctrl-C)")
    p.add_argument("--fps", type=float, default=60.0, help="animation time base (frame t = i/fps)")
    p.add_argument("--out", metavar="DIR", help="write frames as PNGs into DIR")
    p.add_argument("--fast-math", action="store_true", help="approximate rsqrt/reciprocal in the hot loop")
    p.add_argument("--oracle", action="store_true", help="use the XLA oracle path instead of the Pallas kernel")
    p.add_argument("--verbose", "-v", action="store_true",
                   help="debug logging (the env_logger analog, main.rs:1135)")
    p.add_argument("--overlay", action="store_true",
                   help="draw the perf overlay (and the heatmap legend with "
                        "--debug-steps) onto saved frames — the egui GUI analog")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import logging

    logging.basicConfig(
        level=logging.DEBUG if args.verbose else logging.WARNING,
        format="%(levelname)s %(name)s: %(message)s",
    )

    renderer = BlackHoleRenderer(
        args.width,
        args.height,
        args.integrator,
        model=args.model,
        adaptive=args.adaptive,
        disk=args.disk,
        fast_math=args.fast_math,
        use_pallas=False if args.oracle else None,
    )
    print(f"Device: {renderer.device} (pallas={'on' if renderer.use_pallas else 'off'})")

    stats = PerformanceStats()
    logger = None
    if args.perf_log:
        try:
            logger = PerfLogger(args.perf_log)
        except OSError as e:  # degrade to no logging (main.rs:534-542)
            print(f"Warning: failed to create performance log: {e}")

    scene = SceneParams(
        schwarzschild_radius=2.0,
        spin=args.spin if args.model == "kerr" else 0.0,
        screen_width=args.width,
        screen_height=args.height,
        max_steps=args.max_steps,
        debug_mode=DEBUG_STEPS if args.debug_steps else DEBUG_NONE,
    )

    if args.out:
        os.makedirs(args.out, exist_ok=True)
        from .io import native

    start = time.perf_counter()
    first_frame_time = None
    frame_idx = 0
    try:
        while True:
            stats.update_frame_time()
            cpu_start = time.perf_counter()

            if args.duration is not None:
                if first_frame_time is None:
                    first_frame_time = time.perf_counter()
                    print(f"Benchmark started. Will run for {args.duration} seconds.")
                elif time.perf_counter() - first_frame_time >= args.duration:
                    elapsed = time.perf_counter() - first_frame_time
                    print(f"Benchmark duration reached ({elapsed:.2f}s). Exiting...")
                    break

            # camera is a pure function of elapsed time (main.rs:851-869)
            t = time.perf_counter() - start if args.frames == 0 else frame_idx / args.fps
            camera = orbit_camera(t)

            q = TimestampQuery()
            try:
                frame = renderer.render_frame(camera, scene, timestamp_query=q)
            except jax.errors.JaxRuntimeError as e:
                # device-loss analog of the reference's SurfaceError
                # handling (main.rs:1113-1117): log and exit, don't hang
                print(f"Device error, exiting: {e}")
                return 1

            if args.out:
                host = np.asarray(jax.device_get(frame))
                if args.overlay:
                    from .utils.overlay import draw_legend_onto, draw_performance_overlay

                    host = draw_performance_overlay(host, stats)
                    if args.debug_steps:
                        host = draw_legend_onto(host, max_steps=args.max_steps)
                native.submit_frame(
                    os.path.join(args.out, f"frame_{frame_idx:05d}.png"), host
                )

            cpu_ms = (time.perf_counter() - cpu_start) * 1000.0
            stats.update_cpu_time(cpu_ms)
            if q.gpu_time_ms is not None:
                stats.update_gpu_time(q.gpu_time_ms)
            if logger is not None:
                logger.log_frame(stats)

            frame_idx += 1
            if args.frames and frame_idx >= args.frames:
                break
    except KeyboardInterrupt:
        print("Interrupted.")
    finally:
        if args.out:
            failures = native.drain()
            if failures:
                print(f"Warning: {failures} frame write(s) failed")
        if logger is not None:
            logger.close()

    print(
        f"{frame_idx} frames | avg {stats.avg_fps():.1f} FPS "
        f"(min {stats.min_fps():.1f} / max {stats.max_fps():.1f}) | "
        f"avg device {stats.avg_gpu_time():.2f} ms"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

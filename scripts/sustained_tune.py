"""Sustained-state (throttled-chip) tuning for the exact-parity tier.

Round-3 verdict: every autotune pass ran in the UNTHROTTLED burst window,
and the exact tier's sustained slope (19.7 ms) misses the 16 ms target the
fast tier meets in both states. The v5e enters its sustained clock after
~2 s of continuous VPU work (bench.py: a 120-frame scan is enough), so a
candidate's honest sustained cost is the slope of its LATER back-to-back
repeats — the first repeat after a compile measures the burst clock.

Protocol per candidate (the bench.py fused-scan slope, 3 repeats):
  compile (chip idles) -> repeat 1 (burst) -> repeats 2..3 (sustained)
  sustained_ms = min of the positive repeat-2+ slopes (tunnel degradation
  only inflates; the least-degraded sustained pair is the closest
  estimate of the throttled chip's per-frame cost).

Writes one JSON line per candidate; run with
  python scripts/sustained_tune.py [--fast-math] [--out FILE]
and archive the output under measurements/round4/.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def measure(width, height, max_steps, tile, knobs, fast_math, repeats=3,
            n_frames=120, renderer_kw=None):
    from bhr_tpu import BlackHoleRenderer, SceneParams
    from bhr_tpu.animation import OrbitAnimator

    renderer = BlackHoleRenderer(
        width, height, use_pallas=True, tile=tile, fast_math=fast_math,
        kernel_knobs=knobs, **(renderer_kw or {}),
    )
    scene = SceneParams(screen_width=width, screen_height=height,
                        max_steps=max_steps)
    anim = OrbitAnimator(renderer)
    n_small = max(2, n_frames // 10)

    def run(n, start):
        frames = anim.render_frames(n, fps=60.0, start_frame=start,
                                    scene=scene, packed=True)
        jax.block_until_ready(frames)
        return frames

    frames = run(n_small, 0)
    _ = jax.device_get(frames[0, 0, 0])
    run(n_frames, n_small)

    entropy = (time.time_ns() // 1_000_000) % 86_400_000 / 10.0
    slopes = []
    for rep in range(repeats):
        t0 = time.perf_counter()
        run(n_small, entropy + 10_000 + 40_000 * rep)
        t_small = time.perf_counter() - t0
        t0 = time.perf_counter()
        run(n_frames, entropy + 20_000 + 40_000 * rep)
        t_large = time.perf_counter() - t0
        slopes.append(
            round((t_large - t_small) / (n_frames - n_small) * 1000.0, 3)
        )
    sustained = [s for s in slopes[1:] if s > 0]
    return slopes, (min(sustained) if sustained else None)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--fast-math", action="store_true",
                   help="tune the fast tier instead of exact")
    p.add_argument("--out", default="")
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--cands", default="",
                   help="JSON file with a candidate list "
                        '[{"tile": [8,640], "knobs": [0,1,100,0]}, ...] '
                        "replacing the built-in set")
    p.add_argument("--config4", action="store_true",
                   help="tune BASELINE config 4 (1080p rk4 + adaptive + "
                        "disk) instead of the euler headline")
    p.add_argument("--frames", type=int, default=120,
                   help="fused-scan length (120 = mostly-sustained at "
                        "30 ms/frame; ~30 captures the burst window)")
    args = p.parse_args()

    w, h, steps = 1920, 1080, 500
    # knobs = (early_exit_every, unroll, steps_per_check, linear); eee = 0
    # (fixed-trip) is the round-3 winner for the headline config — nothing
    # escapes in 500 steps from camera r = 15, so the cadence only costs.
    cands = [
        {"tile": (8, 640), "knobs": (0, 1, 100, 0)},   # shipped round-3 best
        {"tile": (8, 640), "knobs": (0, 1, 50, 0)},
        {"tile": (8, 640), "knobs": (0, 1, 125, 0)},
        {"tile": (8, 640), "knobs": (0, 1, 250, 0)},
        {"tile": (8, 640), "knobs": (0, 1, 25, 0)},
        {"tile": (8, 384), "knobs": (0, 1, 100, 0)},   # 1920 = 5 x 384 exact
        {"tile": (8, 512), "knobs": (0, 1, 100, 0)},
        {"tile": (16, 640), "knobs": (0, 1, 100, 0)},
        {"tile": (16, 512), "knobs": (0, 1, 100, 0)},
    ]
    if args.cands:
        cands = [
            {"tile": tuple(c["tile"]), "knobs": tuple(c["knobs"])}
            for c in json.load(open(args.cands))
        ]
    renderer_kw = (
        {"integrator": "rk4", "adaptive": True, "disk": True}
        if args.config4 else {}
    )
    if args.config4 and not args.cands:
        # config-4 candidate set: the shipped fast-tier knobs (r3 autotune:
        # (8,512) eee=50 spc=50) + tile/knob crosses; eee matters here
        # (disk + capture retire rays early, unlike the headline)
        cands = [
            {"tile": (8, 512), "knobs": (50, 1, 50, 0)},
            {"tile": (8, 640), "knobs": (50, 1, 50, 0)},
            {"tile": (8, 640), "knobs": (100, 1, 100, 0)},
            {"tile": (8, 640), "knobs": (0, 1, 100, 0)},
            {"tile": (8, 512), "knobs": (100, 1, 50, 0)},
            {"tile": (8, 512), "knobs": (25, 1, 25, 0)},
            {"tile": (16, 512), "knobs": (50, 1, 50, 0)},
        ]
    out = open(args.out, "a") if args.out else None
    best = None
    for cand in cands:
        try:
            slopes, sustained = measure(
                w, h, steps, cand["tile"], cand["knobs"], args.fast_math,
                repeats=args.repeats, n_frames=args.frames,
                renderer_kw=renderer_kw,
            )
        except Exception as e:
            line = {"cand": {k: list(v) for k, v in cand.items()},
                    "error": str(e)[:300]}
            print(json.dumps(line), flush=True)
            if out:
                out.write(json.dumps(line) + "\n")
                out.flush()
            continue
        line = {
            "cand": {k: list(v) for k, v in cand.items()},
            "fast_math": args.fast_math,
            "slopes_ms": slopes,
            "sustained_ms": sustained,
        }
        print(json.dumps(line), flush=True)
        if out:
            out.write(json.dumps(line) + "\n")
            out.flush()
        if sustained is not None and (best is None or
                                      sustained < best["sustained_ms"]):
            best = line
    print(json.dumps({"best": best}), flush=True)
    if out:
        out.write(json.dumps({"best": best}) + "\n")
        out.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Duty-cycle experiment: is the exact tier's 19 ms sustained floor a
chip-state (power/thermal clock) effect, or a property of the program?

Round-4 inferred "power wall" from knob-flatness (15 candidates, all
19.06-57 ms sustained, measurements/round4/sustained_tune.jsonl); the
round-4 verdict asked for ONE direct observation. This probe separates
chip state from program cost by varying REST, not knobs:

  compile + warm
  phase A (saturate): 4 back-to-back slope pairs - repeat 1 is the burst
    window, repeats 2-4 the sustained floor (the round-4 protocol).
  phase B (recover):  for rest in --rests seconds: sleep(rest), then one
    slope pair. If the slope recovers toward the burst value as rest
    grows, the floor is a chip-state wall (clock drops under sustained
    draw, recovers when idle); if it stays at the floor, the sustained
    number is the program's real cost and the burst reading is the
    anomaly (e.g. a one-time cache effect).

Slope pairs use the bench.py protocol: per-frame slope between a small
(n/10) and a full (n) fused scan, fresh start-frame entropy per timed
call so the remote executor's content-addressed result cache can never
replay a timed dispatch. The scan unit is kept SHORT (default 60 frames
~ 1.2 s at the 19 ms floor) so a recovered chip can complete it mostly
inside the ~2 s burst window (bench.py docstring measured the onset).

Run on the real TPU:
  python scripts/duty_cycle_probe.py --out measurements/round5/duty_cycle.jsonl
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="")
    p.add_argument("--frames", type=int, default=60)
    p.add_argument("--saturate", type=int, default=4,
                   help="back-to-back pairs before the recovery phase")
    p.add_argument("--rests", default="2,5,10,30,60",
                   help="idle seconds before each recovery pair")
    p.add_argument("--fast-math", action="store_true",
                   help="probe the fast tier instead of exact")
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--steps", type=int, default=500)
    args = p.parse_args()

    from bhr_tpu import BlackHoleRenderer, SceneParams
    from bhr_tpu.animation import OrbitAnimator
    from bhr_tpu.utils.autotune import load_tuned, tuned_knobs

    tuned = load_tuned(args.width, args.height, args.steps,
                       fast_math=args.fast_math)
    tile = tuple(tuned["tile"]) if tuned else None
    knobs = tuned_knobs(tuned) if tuned else None
    renderer = BlackHoleRenderer(
        args.width, args.height, use_pallas=True, tile=tile,
        fast_math=args.fast_math, kernel_knobs=knobs,
    )
    scene = SceneParams(screen_width=args.width, screen_height=args.height,
                        max_steps=args.steps)
    anim = OrbitAnimator(renderer)
    n = args.frames
    n_small = max(2, n // 10)

    def run(count, start):
        frames = anim.render_frames(count, fps=60.0, start_frame=start,
                                    scene=scene, packed=True)
        jax.block_until_ready(frames)

    out = open(args.out, "a") if args.out else None

    def emit(rec):
        line = json.dumps(rec)
        print(line, flush=True)
        if out:
            out.write(line + "\n")
            out.flush()

    # compile both scan lengths + tunnel warmup, chip then idles a moment
    entropy = (time.time_ns() // 1_000_000) % 86_400_000 / 10.0
    run(n_small, entropy)
    run(n, entropy + 1.0)
    _ = jax.device_get(
        anim.render_frames(2, fps=60.0, start_frame=entropy + 2.0,
                           scene=scene, packed=True)[0, 0, 0]
    )

    def pair(tag, idx):
        t0 = time.perf_counter()
        run(n_small, entropy + 10_000 + 977.0 * idx)
        t_small = time.perf_counter() - t0
        t0 = time.perf_counter()
        run(n, entropy + 20_000 + 977.0 * idx)
        t_large = time.perf_counter() - t0
        slope = (t_large - t_small) / (n - n_small) * 1000.0
        emit({"phase": tag, "idx": idx, "slope_ms": round(slope, 3),
              "t_small_s": round(t_small, 3), "t_large_s": round(t_large, 3)})
        return slope

    meta = {"phase": "meta", "frames": n, "tile": tile, "knobs": knobs,
            "fast_math": args.fast_math,
            "config": f"{args.width}x{args.height}x{args.steps}",
            "device": str(jax.devices()[0])}
    emit(meta)

    idx = 0
    saturate = []
    for _ in range(args.saturate):
        saturate.append(pair("saturate", idx))
        idx += 1
    floor = min(saturate[1:]) if len(saturate) > 1 else saturate[0]
    burst = saturate[0]

    recov = []
    for rest in (float(r) for r in args.rests.split(",")):
        time.sleep(rest)
        s = pair(f"rest_{rest:g}s", idx)
        recov.append((rest, s))
        idx += 1

    # verdict: fraction of the (burst -> floor) gap recovered at max rest
    gap = floor - burst
    best_recovered = min(s for _, s in recov) if recov else floor
    frac = (floor - best_recovered) / gap if gap > 1e-6 else 0.0
    emit({"phase": "verdict", "burst_ms": round(burst, 3),
          "floor_ms": round(floor, 3),
          "best_rested_ms": round(best_recovered, 3),
          "gap_recovered_frac": round(frac, 3),
          "chip_state_wall": bool(frac > 0.5)})


if __name__ == "__main__":
    main()

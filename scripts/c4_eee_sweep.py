#!/usr/bin/env python
"""Config-4 early-exit harvest cost curve, burst state (VERDICT r4 item 8).

Round-4's roofline (scripts/opcount.py) models config 4 (1080p RK4 +
adaptive dt + disk) at ~20.3 ms burst from kernel op counts; measured is
~31 ms. The residual was *attributed* (harvest granularity, under-
weighted selects, live-set pressure) but never decomposed. This probe
fills in the missing measured curve: early_exit_every in {0, 10, 25, 50,
100} at fixed steps_per_check/tile, each point read in the BURST state
(short ~0.9 s scan pairs with rest before each candidate so the chip
re-enters its unthrottled clock — the state the roofline is calibrated
in). The eee=0 point is the pure-integration cost with zero harvest
machinery; the curve's slope in 1/eee is the per-harvest cost; whatever
excess remains at eee=0 over the op-count expectation is select/clip
weighting + live-set pressure, NOT harvest.

Run on the real TPU:
  python scripts/c4_eee_sweep.py --out measurements/round5/c4_eee_sweep.jsonl
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
    p.add_argument("--frames", type=int, default=30)
    p.add_argument("--rest", type=float, default=20.0,
                   help="idle seconds before each candidate (re-enter burst)")
    p.add_argument("--spc", type=int, default=50)
    p.add_argument("--tile", default="8x512")
    p.add_argument("--eee", default="0,10,25,50,100")
    p.add_argument("--pairs", type=int, default=2,
                   help="slope pairs per candidate (best taken)")
    args = p.parse_args()

    from bhr_tpu import BlackHoleRenderer, SceneParams
    from bhr_tpu.animation import OrbitAnimator

    w, h, steps = 1920, 1080, 500
    tile = tuple(int(x) for x in args.tile.split("x"))
    out = open(args.out, "a") if args.out else None

    def emit(rec):
        line = json.dumps(rec)
        print(line, flush=True)
        if out:
            out.write(line + "\n")
            out.flush()

    emit({"phase": "meta", "tile": list(tile), "spc": args.spc,
          "frames": args.frames, "rest_s": args.rest,
          "device": str(jax.devices()[0])})

    n, n_small = args.frames, max(2, args.frames // 10)
    entropy = (time.time_ns() // 1_000_000) % 86_400_000 / 10.0

    for k, eee in enumerate(int(x) for x in args.eee.split(",")):
        renderer = BlackHoleRenderer(
            w, h, use_pallas=True, tile=tile, fast_math=True,
            integrator="rk4", adaptive=True, disk=True,
            kernel_knobs=(eee, 1, args.spc, 0),
        )
        scene = SceneParams(screen_width=w, screen_height=h, max_steps=steps)
        anim = OrbitAnimator(renderer)

        def run(count, start):
            frames = anim.render_frames(count, fps=60.0, start_frame=start,
                                        scene=scene, packed=True)
            jax.block_until_ready(frames)

        # compile both lengths (chip mostly idles during remote compile)
        run(n_small, entropy + 7000 * k)
        run(n, entropy + 7000 * k + 1.0)
        slopes = []
        for rep in range(args.pairs):
            time.sleep(args.rest)
            t0 = time.perf_counter()
            run(n_small, entropy + 7000 * k + 100 + 37.0 * rep)
            t_small = time.perf_counter() - t0
            t0 = time.perf_counter()
            run(n, entropy + 7000 * k + 200 + 37.0 * rep)
            t_large = time.perf_counter() - t0
            slopes.append(
                round((t_large - t_small) / (n - n_small) * 1000.0, 3)
            )
        emit({"eee": eee, "slopes_ms": slopes,
              "burst_ms": min(s for s in slopes if s > 0)})


if __name__ == "__main__":
    main()

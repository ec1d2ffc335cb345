#!/usr/bin/env python
"""Distill-on-demand demo: worst-domain-scene SSIM before/after distill().

The general surrogate covers r0 in [3,60] x rs in [0.5,4] at star-field
SSIM ~0.95 (scripts/neural_quality.py --domain); the roadmap's >0.99 bar
(reference docs/ROADMAP.md:1320-1336) is a per-scene property. This
script measures the renderer.distill() loop closing that gap ON DEVICE:
render a domain scene with the general weights, distill for it (timed),
re-render, and report SSIM before/after plus the distill wall time.

Usage: python scripts/distill_demo.py [--r0 19.52 --rs 3.984]
       [--rays N --steps N] [--out measurements/round4/distill_demo.json]
"""

import argparse
import json
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

from multires_diff import ssim  # noqa: E402


def luma(frame):
    f = np.asarray(frame).astype(np.float32)
    return 0.2126 * f[..., 0] + 0.7152 * f[..., 1] + 0.0722 * f[..., 2]


def main():
    ap = argparse.ArgumentParser()
    # default: the worst scene of the 16-scene domain gauge
    ap.add_argument("--r0", type=float, default=19.52)
    ap.add_argument("--rs", type=float, default=3.984)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--rays", type=int, default=1_000_000)
    ap.add_argument("--train-steps", type=int, default=8_000)
    ap.add_argument("--out", default="")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from bhr_tpu import BlackHoleRenderer, Camera, SceneParams

    w, h = args.width, args.height
    cam = Camera.new(
        [0.0, args.r0 * 0.316, args.r0 * 0.949], [0.0, 0.0, 0.0],
        [0.0, 1.0, 0.0],
    )
    scene = SceneParams(
        screen_width=w, screen_height=h, max_steps=args.steps,
        schwarzschild_radius=jnp.float32(args.rs),
    )
    ref = BlackHoleRenderer(w, h, fast_math=True)
    net = BlackHoleRenderer(w, h, integrator="neural")

    f_ref = luma(ref.render_frame(cam, scene))
    ssim_before = ssim(f_ref, luma(net.render_frame(cam, scene)))

    t0 = time.time()
    metrics = net.distill(
        cam, scene, rays=args.rays, steps=args.train_steps,
    )
    distill_s = time.time() - t0

    ssim_after = ssim(f_ref, luma(net.render_frame(cam, scene)))

    record = {
        "scene": {"r0": args.r0, "rs": args.rs,
                  "config": f"{w}x{h}x{args.steps}"},
        "budget": {"rays": args.rays, "train_steps": args.train_steps},
        "distill_wall_s": round(distill_s, 1),
        "ssim_before": round(float(ssim_before), 5),
        "ssim_after": round(float(ssim_after), 5),
        "holdout": {k: round(float(v), 6) for k, v in metrics.items()},
    }
    print(json.dumps(record))
    if args.out:
        pathlib.Path(args.out).parent.mkdir(parents=True, exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(record, f, indent=1)


if __name__ == "__main__":
    main()

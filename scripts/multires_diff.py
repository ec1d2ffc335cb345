#!/usr/bin/env python
"""At-scale quality check for multi-resolution rendering (ROADMAP Phase 4-1).

Renders the 1080p x 500 headline scene at full resolution and through
render_multires on the live backend, then reports the error statistics the
reference's Phase 4-1 sets as its bar ("visual quality loss imperceptible,
SSIM > 0.95"): mean |u8| error, fraction of pixels off by > 16 levels, and
a global SSIM over the luma plane.

Usage: python scripts/multires_diff.py [divisor]
Prints one JSON line.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def ssim(a, b, c1=(0.01 * 255) ** 2, c2=(0.03 * 255) ** 2, win=8):
    """Mean local SSIM over non-overlapping win x win blocks (luma)."""
    h = a.shape[0] // win * win
    w = a.shape[1] // win * win
    ab = a[:h, :w].reshape(h // win, win, w // win, win).transpose(0, 2, 1, 3)
    bb = b[:h, :w].reshape(h // win, win, w // win, win).transpose(0, 2, 1, 3)
    mu_a = ab.mean(axis=(2, 3))
    mu_b = bb.mean(axis=(2, 3))
    va = ab.var(axis=(2, 3))
    vb = bb.var(axis=(2, 3))
    cov = (ab * bb).mean(axis=(2, 3)) - mu_a * mu_b
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a**2 + mu_b**2 + c1) * (va + vb + c2)
    )
    return float(s.mean())


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("divisor", nargs="?", type=int, default=3)
    ap.add_argument("--disk", action="store_true",
                    help="gauge BASELINE config 4 (rk4 + adaptive + disk) "
                         "instead of the euler headline")
    args = ap.parse_args()
    divisor = args.divisor

    from bhr_tpu import BlackHoleRenderer, Camera, SceneParams

    w, h, steps = 1920, 1080, 500
    cam = Camera.default()
    scene = SceneParams(screen_width=w, screen_height=h, max_steps=steps)
    rkw = (
        dict(integrator="rk4", adaptive=True, disk=True) if args.disk else {}
    )
    r = BlackHoleRenderer(w, h, fast_math=True, **rkw)
    full = np.asarray(r.render_frame(cam, scene)).astype(np.int32)
    multi = np.asarray(
        r.render_frame_multires(cam, scene, divisor=divisor)
    ).astype(np.int32)
    diff = np.abs(full[..., :3] - multi[..., :3])
    luma_f = full[..., :3].mean(-1)
    luma_m = multi[..., :3].mean(-1)
    print(
        json.dumps(
            {
                "divisor": divisor,
                "config": "1080p_rk4_adaptive_disk" if args.disk
                          else "1080p_euler_headline",
                "mean_u8_error": round(float(diff.mean()), 4),
                "frac_off_gt16": round(float((diff.max(-1) > 16).mean()), 6),
                "ssim": round(ssim(luma_f, luma_m), 4),
                "backend": r.context.platform,
            }
        )
    )


if __name__ == "__main__":
    main()

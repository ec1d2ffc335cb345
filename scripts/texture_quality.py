#!/usr/bin/env python
"""Quality gauge for the texture-skybox gather-count optimizations.

Renders the 1080p x 500 headline scene against the 4K procedural star-map
texture (the reference's real workload shape, src/ray_tracer_euler.wgsl:
101-105) with each speed tier, and reports SSIM / error stats both vs the
FULL-RES EXACT-BILINEAR render (the absolute bar) and vs the variant's OWN
full-res filter tier (the approximation-validity bar — full-res nearest
itself sits at SSIM ~0.994 vs exact bilinear, so a nearest-tier speedup
can only be judged against full-res nearest).

Usage: python scripts/texture_quality.py [width height steps]
Prints one JSON line per tier.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from multires_diff import ssim  # noqa: E402  (same measurement everywhere)


def main():
    w = int(sys.argv[1]) if len(sys.argv) > 1 else 1920
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 1080
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 500

    from bhr_tpu import BlackHoleRenderer, Camera, SceneParams
    from bhr_tpu.io.skybox import procedural_starfield

    sky = procedural_starfield(2048, 4096, seed=2020)
    cam = Camera.default()
    scene = SceneParams(screen_width=w, screen_height=h, max_steps=steps)

    def render(filter, texsub=1, multires=0):
        r = BlackHoleRenderer(
            w, h, skybox=sky, texture_filter=filter, texture_subsample=texsub,
            fast_math=True,
        )
        if multires:
            return np.asarray(
                r.render_frame_multires(cam, scene, divisor=multires)
            )
        return np.asarray(r.render_frame(cam, scene))

    refs = {
        "bilinear": render("bilinear").astype(np.int32),
        "nearest": render("nearest").astype(np.int32),
    }
    luma = {k: v[..., :3].mean(-1) for k, v in refs.items()}

    print(
        json.dumps(
            {
                "tier": "nearest_fullres",
                "ssim_vs_exact_bilinear": round(
                    ssim(luma["bilinear"], luma["nearest"]), 5
                ),
            }
        ),
        flush=True,
    )

    tiers = [
        ("nearest_checker", dict(filter="nearest", texsub="checker")),
        ("nearest_texsub2", dict(filter="nearest", texsub=2)),
        ("bilinear_checker", dict(filter="bilinear", texsub="checker")),
        ("bilinear_texsub2", dict(filter="bilinear", texsub=2)),
        ("bilinear_checker_mr3", dict(filter="bilinear", texsub="checker", multires=3)),
        ("nearest_checker_mr3", dict(filter="nearest", texsub="checker", multires=3)),
        ("nearest_texsub2_mr3", dict(filter="nearest", texsub=2, multires=3)),
        ("luma", dict(filter="luma")),
        ("luma_mr3", dict(filter="luma", multires=3)),
        ("luma_sub4", dict(filter="luma", texsub=4)),
        ("luma_sub4_mr3", dict(filter="luma", texsub=4, multires=3)),
        ("luma_sub8_mr3", dict(filter="luma", texsub=8, multires=3)),
    ]
    for name, kw in tiers:
        f = render(**kw).astype(np.int32)
        # the luma tier's quality bar is exact bilinear (its luminance IS
        # exact bilinear; only chroma is approximated)
        own = "bilinear" if kw["filter"] == "luma" else kw["filter"]
        lf = f[..., :3].mean(-1)
        diff = np.abs(refs[own][..., :3] - f[..., :3])
        print(
            json.dumps(
                {
                    "tier": name,
                    "ssim_vs_exact_bilinear": round(ssim(luma["bilinear"], lf), 5),
                    "ssim_vs_own_fullres": round(ssim(luma[own], lf), 5),
                    "mean_u8_err_vs_own": round(float(diff.mean()), 4),
                    "frac_gt16_vs_own": round(float((diff > 16).mean()), 5),
                    "max_u8_err_vs_own": int(diff.max()),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""BASELINE config 1: 256x256 Schwarzschild, max_steps=200, PNG out —
CPU-jax oracle render diffed against the Pallas kernel path.

The reference's WGSL render cannot be produced in this environment (no
GPU/wgpu); the line-faithful XLA oracle (ops/trace.py transcribes
ray_tracer_euler.wgsl operation-by-operation) stands in as the reference
numerics, and the TPU kernel is diffed against it per-pixel.

Usage: python scripts/golden_diff.py [out_dir]
Prints one JSON line with the per-pixel L_inf (u8 levels) and mismatch
fraction; writes oracle/kernel PNGs and the abs-diff visualization.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "golden_diff_out"
    os.makedirs(out_dir, exist_ok=True)

    from bhr_tpu import BlackHoleRenderer, Camera, SceneParams

    cam = Camera.new([15.0, 5.0, 0.0], [0.0, 0.0, 0.0], [0.0, 1.0, 0.0])
    scene = SceneParams(screen_width=256, screen_height=256, max_steps=200)

    oracle = BlackHoleRenderer(256, 256, use_pallas=False)
    oracle.render_frame(cam, scene)
    oracle.save_image(os.path.join(out_dir, "oracle_256.png"))
    a = oracle.get_image_data().astype(np.int32)

    kernel = BlackHoleRenderer(256, 256, use_pallas=True)
    kernel.render_frame(cam, scene)
    kernel.save_image(os.path.join(out_dir, "kernel_256.png"))
    b = kernel.get_image_data().astype(np.int32)

    diff = np.abs(a - b)[..., :3]
    linf_u8 = int(diff.max())
    mismatch = float((diff.max(axis=-1) > 0).mean())

    from PIL import Image

    vis = np.zeros((256, 256, 3), np.uint8)
    vis[..., 0] = np.clip(diff.max(axis=-1) * 64, 0, 255)
    Image.fromarray(vis, "RGB").save(os.path.join(out_dir, "absdiff_x64.png"))

    print(
        json.dumps(
            {
                "config": "256x256_schwarzschild_steps200",
                "linf_u8_levels": linf_u8,
                "linf_unit_scale": round(linf_u8 / 255.0, 6),
                "mismatched_pixel_frac": round(mismatch, 6),
                "kernel_backend": kernel.device.platform,
                "note": "oracle = line-faithful XLA transcription of "
                "ray_tracer_euler.wgsl (the reference GPU render is not "
                "producible in this environment)",
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

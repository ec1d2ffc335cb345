#!/usr/bin/env python
"""Measure the multires edge-mask fraction (and fix-up tile fraction).

The multires fix-up pass costs ~(flagged tile fraction) x (full render), so
its win collapses when the edge detector over-fires. This prints, per
config: the flagged low-pixel fraction, the flagged full-res pixel
fraction, and the flagged (8, 256) fix-tile fraction — plus a breakdown of
WHY pixels were flagged (status edge vs deflection-curvature edge) at a
sweep of thresholds.

Usage: python scripts/multires_edges.py [config]
  config in {headline, rk4disk, kerr4k, kerr4k_small}; default all but 4K.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np


def main():
    from bhr_tpu.core.camera import Camera
    from bhr_tpu.core.scene import SceneParams
    from bhr_tpu.ops.multires import deflection_edges
    from bhr_tpu.ops.pallas_trace import pallas_trace_image, pick_tile
    from bhr_tpu.ops.resample import neighbor_max, shift
    from bhr_tpu.ops.trace import TraceConfig
    from bhr_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    configs = {
        "headline": (1920, 1080, 500, TraceConfig(), 0.0),
        "rk4disk": (
            1920, 1080, 500,
            TraceConfig(integrator="rk4", adaptive=True, disk=True), 0.0,
        ),
        "kerr4k": (
            3840, 2160, 2000,
            TraceConfig(model="kerr", disk=True), 0.9,
        ),
        "kerr4k_small": (
            1280, 720, 2000,
            TraceConfig(model="kerr", disk=True), 0.9,
        ),
    }
    want = sys.argv[1:] or ["headline", "rk4disk", "kerr4k"]
    divisor = 3
    cam = Camera.default()

    for name in want:
        w, h, steps, cfg, spin = configs[name]
        scene = SceneParams(
            screen_width=w, screen_height=h, max_steps=steps,
            spin=jnp.float32(spin),
        )
        lh, lw = -(-h // divisor), -(-w // divisor)
        low = pallas_trace_image(
            cam, scene, cfg, tile=pick_tile(lw), fast_math=True,
            track_steps=False, local_shape=(lh, lw), stride=divisor,
            early_exit_every=0, steps_per_check=_spc(steps),
        )
        lv = np.asarray(low.final_vel)
        st = np.asarray(low.status)
        planes = tuple(jnp.asarray(lv[..., k]) for k in range(3))
        stj = jnp.asarray(st)

        # status-only edge mask (threshold-independent)
        st_edge = np.zeros_like(st, bool)
        for ax in (0, 1):
            for s in (-1, 1):
                st_edge |= np.asarray(shift(stj.astype(jnp.float32), s, ax)) != st
        st_edge = np.asarray(
            neighbor_max(jnp.asarray(st_edge.astype(np.float32)))
        ) > 0

        out = {
            "config": name,
            "low_shape": [lh, lw],
            "status_counts": {
                int(k): int(v) for k, v in zip(*np.unique(st, return_counts=True))
            },
            "status_edge_frac": round(float(st_edge.mean()), 4),
        }
        for thresh in (0.05, 0.1, 0.2):
            edge = np.asarray(deflection_edges(planes, stj, thresh)) > 0
            # full-res fix-tile fraction at the default (8, 256) fix tile
            full = np.repeat(np.repeat(edge, divisor, 0), divisor, 1)[:h, :w]
            th_, tw_ = 8, 256
            pad_h, pad_w = -(-h // th_) * th_, -(-w // tw_) * tw_
            fp = np.zeros((pad_h, pad_w), bool)
            fp[:h, :w] = full
            tiles = fp.reshape(pad_h // th_, th_, pad_w // tw_, tw_).any((1, 3))
            out[f"edge_frac@{thresh}"] = round(float(edge.mean()), 4)
            out[f"fix_tile_frac@{thresh}"] = round(float(tiles.mean()), 4)
        print(json.dumps(out), flush=True)


def _spc(steps):
    for c in (50, 25, 20, 10, 5, 4, 2, 1):
        if steps % c == 0:
            return c
    return 1


if __name__ == "__main__":
    main()

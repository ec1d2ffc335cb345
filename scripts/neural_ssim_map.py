#!/usr/bin/env python
"""Decompose a surrogate frame's SSIM deficit spatially (round 5).

Input: the npz written by `scripts/neural_quality.py --save` (reference +
surrogate frames, capture masks, final velocities). The suite SSIM is the
MEAN over non-overlapping 8x8 luma blocks (scripts/multires_diff.ssim), so
the per-block SSIM map decomposes the metric exactly: summing (1 - s) over
blocks and dividing by the block count reproduces 1 - SSIM. The question
this answers: is the deficit concentrated in a thin annulus at the shadow
edge (photon-ring band — a representation/envelope problem), or spread
over the frame (a bulk-accuracy problem)?

Usage:
  python scripts/neural_quality.py --model kerr --weights W --save D.npz
  python scripts/neural_ssim_map.py D.npz [--out measurements/...json]
"""

import argparse
import json

import numpy as np

WIN = 8


def luma(frame):
    f = frame.astype(np.float32)
    return 0.2126 * f[..., 0] + 0.7152 * f[..., 1] + 0.0722 * f[..., 2]


def block_ssim_map(a, b, c1=(0.01 * 255) ** 2, c2=(0.03 * 255) ** 2):
    h = a.shape[0] // WIN * WIN
    w = a.shape[1] // WIN * WIN
    ab = a[:h, :w].reshape(h // WIN, WIN, w // WIN, WIN).transpose(0, 2, 1, 3)
    bb = b[:h, :w].reshape(h // WIN, WIN, w // WIN, WIN).transpose(0, 2, 1, 3)
    mu_a = ab.mean(axis=(2, 3))
    mu_b = bb.mean(axis=(2, 3))
    va = ab.var(axis=(2, 3))
    vb = bb.var(axis=(2, 3))
    cov = (ab * bb).mean(axis=(2, 3)) - mu_a * mu_b
    return ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a**2 + mu_b**2 + c1) * (va + vb + c2)
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dump")
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    z = np.load(args.dump)
    f_ref, f_net = z["f_ref"], z["f_net"]
    cap = z["cap_ref"]

    s = block_ssim_map(luma(f_ref), luma(f_net))
    deficit = 1.0 - s
    total = float(deficit.sum())
    ssim_val = float(s.mean())

    # distance (in pixels) of each block center from the shadow edge
    edge = cap ^ np.roll(cap, 1, 0) | (cap ^ np.roll(cap, 1, 1))
    ey, ex = np.nonzero(edge)
    by = (np.arange(s.shape[0]) + 0.5) * WIN
    bx = (np.arange(s.shape[1]) + 0.5) * WIN
    byy, bxx = np.meshgrid(by, bx, indexing="ij")
    # chunked nearest-edge distance (edge point count ~ thousands)
    pts = np.stack([ey, ex], 1).astype(np.float32)
    d = np.full(s.shape, np.inf, np.float32)
    centers = np.stack([byy.ravel(), bxx.ravel()], 1).astype(np.float32)
    for i in range(0, len(pts), 4096):
        chunk = pts[i:i + 4096]
        dd = np.sqrt(
            ((centers[:, None, :] - chunk[None, :, :]) ** 2).sum(-1)
        ).min(1)
        d = np.minimum(d, dd.reshape(s.shape))

    # angular error field (both-live pixels)
    live = ~cap & ~z["cap_net"]
    dot = np.clip((z["vel_ref"] * z["vel_net"]).sum(-1), -1.0, 1.0)
    ang = np.degrees(np.arccos(dot))

    bands = [0, 4, 8, 16, 32, 64, 128, 1e9]
    rows = []
    for lo, hi in zip(bands[:-1], bands[1:]):
        m = (d >= lo) & (d < hi)
        if not m.any():
            continue
        bm = np.kron(m, np.ones((WIN, WIN), bool))
        bm = bm[: cap.shape[0], : cap.shape[1]]
        am = bm & live
        rows.append({
            "band_px": [lo, None if hi > 1e8 else hi],
            "blocks": int(m.sum()),
            "deficit_share": round(float(deficit[m].sum()) / total, 4),
            "mean_block_ssim": round(float(s[m].mean()), 5),
            "ang_err_median_deg": (
                round(float(np.median(ang[am])), 4) if am.any() else None
            ),
            "ang_err_p99_deg": (
                round(float(np.percentile(ang[am], 99)), 3) if am.any()
                else None
            ),
        })
    rec = {"ssim": round(ssim_val, 5), "total_deficit": round(total, 2),
           "bands": rows}
    out = json.dumps(rec, indent=1)
    print(out)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out + "\n")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Probe the oracle dynamics' weak-field deflection asymptote.

Hypothesis (round-4 generality work): the reference Euler dynamics'
deflection for a ray starting at radius r0 with angle psi to the radial
direction asymptotes, far from the critical impact parameter, to the
point-mass partial-bending formula

    delta_wf = K * (rs / r0) * tan(psi / 2)

(K = 1 for GR's full 2rs/b bending integrated from the start point to
infinity along the straight-line path). If true, `delta / scaffold` is an
O(1), slowly-varying quantity over the whole live domain, and the MLP can
predict its LOG — making bf16 matmul output noise *relative* to the
deflection instead of absolute (the measured 0.03-0.09 deg general-net
error floor is flat across scenes, i.e. absolute — the signature of head
noise, not capacity).

Outputs JSON lines binned by q = b_c/b (criticality) with the ratio
statistics, plus the sign distribution of the wrapped deflection.
"""

import json
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from bhr_tpu.models import neural


def main():
    n = 262_144
    key = jax.random.PRNGKey(7)
    ds = neural.make_dataset(key, n, max_steps=500, dt=0.1)
    r0 = np.asarray(ds["r0"])
    rs = np.asarray(ds["rs"])
    c = np.asarray(ds["cos_psi"])
    s = np.asarray(ds["sin_psi"])
    a = np.asarray(ds["a"])
    b = np.asarray(ds["b"])
    cap = np.asarray(ds["captured"]) > 0.5

    psi = np.arctan2(s, c)
    phi = np.arctan2(b, a)
    delta = np.mod(phi - psi + np.pi, 2 * np.pi) - np.pi  # wrapped (-pi, pi]

    scaffold = (rs / r0) * s / (1.0 + c + 1e-6)
    q = np.clip(2.598076211 * rs / (r0 * s + 1e-6), 0, 4)

    live = ~cap
    print(json.dumps({"n": int(n), "captured_frac": float(cap.mean())}))
    # sign distribution of the wrapped deflection among live rays
    neg = (delta < 0) & live
    print(json.dumps({
        "live_delta_neg_frac": float(neg.sum() / live.sum()),
        "live_delta_neg_p99_mag": float(
            np.percentile(-delta[neg], 99) if neg.any() else 0.0),
    }))
    edges = [0.0, 0.1, 0.2, 0.3, 0.5, 0.7, 0.8, 0.9, 0.95, 0.99, 1.0]
    for lo, hi in zip(edges[:-1], edges[1:]):
        m = live & (q >= lo) & (q < hi) & (delta > 0)
        if m.sum() < 10:
            continue
        ratio = delta[m] / scaffold[m]
        print(json.dumps({
            "q_bin": [lo, hi],
            "n": int(m.sum()),
            "ratio_p5": float(np.percentile(ratio, 5)),
            "ratio_med": float(np.median(ratio)),
            "ratio_p95": float(np.percentile(ratio, 95)),
            "log_ratio_med": float(np.median(np.log(ratio))),
            "log_ratio_spread_p5_p95": [
                float(np.percentile(np.log(ratio), 5)),
                float(np.percentile(np.log(ratio), 95)),
            ],
        }))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Envelope-shape iteration on a cached dataset (see neural_cache_ds.py).

Round 1 (scripts/envelope_ab.py, measurements/neural/envelope_ab.jsonl)
showed the v3 envelope halves the weak-field median but fattens the p99
tail vs the v2 absolute head — hypothesis: the envelope's log spike at
the GR critical impact parameter (t = 0) is misaligned with the Euler
dynamics' true capture boundary, over-amplifying near-ring errors.

This script (a) measures the dynamics' actual capture-boundary offset t0
from the cached data (logistic fit over inbound rays), and (b) trains
envelope variants on the same data/seed and reports error percentiles
per criticality bin.

Usage: python scripts/envelope_ab2.py /tmp/bhr_ds4m.npz [steps]
"""

import functools
import json
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

import jax
import jax.numpy as jnp
import numpy as np

from bhr_tpu.models import neural
from neural_cache_ds import load

_BC = 2.598076211


def t_coord(ds):
    return np.asarray(
        ds["r0"] * ds["sin_psi"] / (_BC * ds["rs"]) - 1.0
    )


def fit_boundary_offset(ds):
    """Logistic fit of captured-vs-t over inbound rays: P = sig(-(t-t0)/w)."""
    t = t_coord(ds)
    cap = np.asarray(ds["captured"]) > 0.5
    inb = np.asarray(ds["cos_psi"]) < -0.1
    m = inb & (np.abs(t) < 0.3)
    tt, cc = t[m], cap[m].astype(np.float64)
    # crude but robust: scan t0 grid, pick max agreement of sign rule
    grid = np.linspace(-0.1, 0.1, 201)
    acc = [( (tt < g) == (cc > 0.5) ).mean() for g in grid]
    i = int(np.argmax(acc))
    # also per-mu-bin offsets
    mu = np.asarray(ds["rs"] / ds["r0"])[m]
    rows = []
    for lo, hi in [(0.0, 0.02), (0.02, 0.05), (0.05, 0.12), (0.12, 0.7)]:
        mm = (mu >= lo) & (mu < hi)
        if mm.sum() < 500:
            continue
        a2 = [((tt[mm] < g) == (cc[mm] > 0.5)).mean() for g in grid]
        rows.append({"mu_bin": [lo, hi], "t0": float(grid[int(np.argmax(a2))]),
                     "acc": float(np.max(a2)), "n": int(mm.sum())})
    return float(grid[i]), float(acc[i]), rows


def make_env(floor, t0=0.0):
    def env(r0, rs, sin_psi):
        r0 = jnp.asarray(r0, jnp.float32)
        rs = jnp.asarray(rs, jnp.float32)
        sin_psi = jnp.asarray(sin_psi, jnp.float32)
        t = r0 * sin_psi / (_BC * rs) - 1.0 - t0
        return (rs / r0) * sin_psi * (
            0.25 + jnp.log1p(1.0 / (jnp.abs(t) + floor))
        )
    return env


def profile(params, ev):
    feats = neural.ray_features(ev["r0"], ev["rs"], ev["cos_psi"], ev["sin_psi"])
    out = neural.mlp_apply(params, feats)
    delta = neural.delta_envelope(
        ev["r0"], ev["rs"], ev["sin_psi"], ev["cos_psi"]
    ) * out[..., 0]
    phi = jnp.arctan2(ev["sin_psi"], ev["cos_psi"]) + delta
    cosang = jnp.clip(
        jnp.cos(phi) * ev["a"] + jnp.sin(phi) * ev["b"], -1.0, 1.0
    )
    ang = np.degrees(np.asarray(jnp.arccos(cosang)))
    live = np.asarray(ev["captured"]) < 0.5
    t = np.abs(t_coord(ev))
    rows = []
    for lo, hi in [(0.0, 0.02), (0.02, 0.1), (0.1, 0.5), (0.5, 2.0), (2.0, 1e9)]:
        m = live & (t >= lo) & (t < hi)
        if m.sum() < 50:
            continue
        rows.append({
            "abs_t": [lo, hi], "n": int(m.sum()),
            "med": round(float(np.median(ang[m])), 5),
            "p99": round(float(np.percentile(ang[m], 99)), 4),
        })
    return rows


def main():
    path = sys.argv[1]
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 60_000
    train_ds, ev = load(path)
    t0, acc, rows = fit_boundary_offset(train_ds)
    print(json.dumps({"boundary_t0": t0, "acc": acc, "per_mu": rows}),
          flush=True)

    env_real = neural.delta_envelope
    variants = [
        ("env_2e3", make_env(2e-3)),
        ("env_2e2", make_env(2e-2)),
        ("env_2e2_t0", make_env(2e-2, t0)),
        ("v2_abs", lambda r0, rs, s: jnp.ones_like(jnp.asarray(r0, jnp.float32))),
    ]
    k_fit = jax.random.split(jax.random.PRNGKey(11), 3)[2]
    for tag, env in variants:
        neural.delta_envelope = env
        t1 = time.time()
        res = neural.train(k_fit, train_ds, hidden=(128, 128, 128),
                           steps=steps, batch_size=16384, lr=3e-4)
        full = neural.evaluate(res.params, ev)
        out = {
            "tag": tag, "train_s": round(time.time() - t1, 1),
            "final_loss": res.final_loss,
            "median_deg": full["median_deg"], "p99_deg": full["p99_deg"],
            "capture_acc": full["capture_acc"],
            "profile": profile(res.params, ev),
        }
        print(json.dumps(out), flush=True)
    neural.delta_envelope = env_real


if __name__ == "__main__":
    main()

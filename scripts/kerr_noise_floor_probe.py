#!/usr/bin/env python
"""Discriminate fit error vs TPU-matmul noise for the distilled Kerr net.

Generates a held-out pinned-manifold eval set (same construction the
distillation used: default scene camera (0,5,15), rs=2, a*=0.9,
r x1.05 band, cth +-0.02, frame psi band), evaluates the given weights
with CPU fp32 matmuls (IEEE-exact multiplies — no bf16 operand
rounding), and prints median/p99. Compare against the TPU-recorded
eval (median 0.0396 deg for kerr_d4): if CPU ~= TPU the residual is
the net's FIT, so more/better training helps; if CPU is much lower,
the bulk error is the TPU's bf16-multiply noise floor on the head
coefficient and the lever is the head/envelope design, not training.

Usage: python scripts/kerr_noise_floor_probe.py /tmp/kerr_d4.npz [--rays N]
"""

import argparse
import json
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("weights")
    ap.add_argument("--rays", type=int, default=131_072)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--save", default="", help="save the eval set npz")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from bhr_tpu.models import neural_kerr as nk

    params, meta = nk.load_params(args.weights)
    r_lo, r_hi = (float(x) for x in meta["r_range"])
    rs = float(meta["rs_range"][0])
    spin = float(meta["spin_range"][0])
    cth0 = float(meta.get("cth0", 0.3162277))
    # the d3/d4 recipe: cth_margin 0.02, frame psi band for the default
    # 16:9 fov=pi/3 camera (renderer.distill narrowing: ~[0.33, pi])
    psi_range = (0.33, float(np.pi))
    t0 = time.time()
    ds = nk.make_dataset_kerr(
        jax.random.PRNGKey(args.seed), args.rays,
        max_steps=int(meta.get("max_steps", 500)), dt=0.1,
        r_range=(r_lo, r_hi), rs_range=(rs, rs),
        spin_range=(spin, spin),
        cth_range=(cth0 - 0.02, cth0 + 0.02),
        boundary_frac=0.35, psi_range=psi_range,
    )
    gen_s = time.time() - t0
    m = nk.evaluate(params, ds)
    out = {
        "weights": args.weights,
        "rays": args.rays,
        "platform": "cpu-fp32-exact",
        "gen_s": round(gen_s, 1),
        **{k: round(float(v), 6) for k, v in m.items()},
    }
    if args.save:
        np.savez_compressed(
            args.save, **{k: np.asarray(v) for k, v in ds.items()})
        out["saved"] = args.save
    print(json.dumps(out))


if __name__ == "__main__":
    main()

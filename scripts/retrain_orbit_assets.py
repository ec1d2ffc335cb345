#!/usr/bin/env python
"""Retrain both orbit-distilled assets after a FEATURE_VERSION bump.

One process, one shared orbit-domain dataset (r0 in [13,19], rs in
[1.5,2.5], the benchmark manifold): the 128-wide *_orbit.npz warm-starts
from the committed general net; the 256-wide *_orbit_xl.npz trains
fresh. Mirrors the two train_neural.py invocations that produced the
round-3 assets but shares the expensive oracle-traced dataset.

Usage: python scripts/retrain_orbit_assets.py [RAYS] [STEPS]
"""

import json
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax

from bhr_tpu.models import neural

ASSETS = REPO / "bhr_tpu" / "assets"
R_RANGE = (13.0, 19.0)
RS_RANGE = (1.5, 2.5)


def main():
    rays = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 150_000
    key = jax.random.PRNGKey(0)
    k_train, k_eval, k_fit = jax.random.split(key, 3)
    t0 = time.time()
    dataset = neural.make_dataset(
        k_train, rays, max_steps=500, r_range=R_RANGE, rs_range=RS_RANGE
    )
    eval_set = neural.make_dataset(
        k_eval, 262_144, max_steps=500, r_range=R_RANGE, rs_range=RS_RANGE
    )
    print(f"dataset: {time.time() - t0:.1f}s", flush=True)

    general, _ = neural.load_params(str(ASSETS / "neural_schwarzschild.npz"))
    jobs = (
        ("neural_schwarzschild_orbit.npz", general, None),
        ("neural_schwarzschild_orbit_xl.npz", None, (256, 256, 256)),
    )
    for name, warm, hidden in jobs:
        t1 = time.time()
        res = neural.train(
            k_fit, dataset, hidden=hidden or (128, 128, 128), steps=steps,
            batch_size=16384, lr=3e-4 if warm is None else 1e-4,
            warm_start=warm,
        )
        metrics = neural.evaluate(res.params, eval_set)
        out = ASSETS / name
        neural.save_params(
            str(out), res.params,
            meta=dict(
                hidden=tuple(w.shape[1] for w, _ in res.params[:-1]),
                max_steps=500, dt=0.1, train_rays=rays, train_steps=steps,
                r_range=R_RANGE, rs_range=RS_RANGE,
                final_loss=res.final_loss, **metrics,
            ),
        )
        print(json.dumps({
            "out": name, "train_s": round(time.time() - t1, 1),
            "final_loss": res.final_loss, **metrics,
        }), flush=True)


if __name__ == "__main__":
    main()

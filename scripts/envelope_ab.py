#!/usr/bin/env python
"""Controlled A/B of the feature_version-3 envelope parameterization.

Same dataset, same seeds, same width/steps: train once with the analytic
deflection envelope (v3, delta = E * g) and once with E forced to 1 (the
v2 absolute head), and evaluate both on the same held-out set — plus a
weak-field corner slice (r0 > 25, rs < 1.2) where the v2 absolute bf16
noise floor dominated the general net's error.
"""

import json
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np

from bhr_tpu.models import neural


def eval_slices(params, eval_set):
    full = neural.evaluate(params, eval_set)
    m = np.asarray(
        (eval_set["r0"] > 25.0) & (eval_set["rs"] < 1.2)
    )
    weak = {k: jnp.asarray(np.asarray(v)[m]) for k, v in eval_set.items()}
    wk = neural.evaluate(params, weak)
    return {
        "median_deg": full["median_deg"],
        "p99_deg": full["p99_deg"],
        "capture_acc": full["capture_acc"],
        "weak_median_deg": wk["median_deg"],
        "weak_p99_deg": wk["p99_deg"],
        "weak_n": int(m.sum()),
    }


def main():
    rays = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 60_000
    key = jax.random.PRNGKey(11)
    k_data, k_eval, k_fit = jax.random.split(key, 3)
    t0 = time.time()
    dataset = neural.make_dataset(k_data, rays, max_steps=500)
    eval_set = neural.make_dataset(k_eval, 262_144, max_steps=500)
    print(json.dumps({"dataset_s": round(time.time() - t0, 1),
                      "rays": rays, "steps": steps}), flush=True)

    envelope_real = neural.delta_envelope
    for tag, env in (
        ("v3_envelope", envelope_real),
        ("v2_absolute", lambda r0, rs, s, c: jnp.ones_like(
            jnp.asarray(r0, jnp.float32))),
    ):
        neural.delta_envelope = env
        t1 = time.time()
        res = neural.train(
            k_fit, dataset, hidden=(128, 128, 128), steps=steps,
            batch_size=16384, lr=3e-4,
        )
        out = eval_slices(res.params, eval_set)
        out.update(tag=tag, train_s=round(time.time() - t1, 1),
                   final_loss=res.final_loss)
        print(json.dumps(out), flush=True)
    neural.delta_envelope = envelope_real


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Round-3 envelope iteration: inbound-gating the log spike.

envelope_ab2 profiles showed the v3 envelope beats the absolute head in
the far field but fattens p99 in every |t| < 0.5 bin. Root cause
candidate: the log spike at b = b_c fires for OUTBOUND rays too (c > 0,
b ~ b_c) where nothing diverges — true delta is tiny there, so the spike
multiplies head noise by ~16x exactly where it hurts, and the E^2
gradient amplification diverts capacity. The divergence is physical only
for inbound rays (they pass the photon sphere); gate the spike with
sigmoid(-8 cos psi).

Usage: python scripts/envelope_ab3.py /tmp/bhr_ds4m.npz [steps]

HISTORICAL RECORD: this A/B selected the gated envelope that is now
models/neural.delta_envelope (4-arg, sigmoid(-8 cos psi) gate). The
monkeypatching below assumes the pre-gate 3-arg envelope and will not
run against current models/neural.py; results are archived in
measurements/neural/envelope_ab.jsonl.
"""

import json
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

import jax
import jax.numpy as jnp

from bhr_tpu.models import neural
from envelope_ab2 import profile
from neural_cache_ds import load

_BC = 2.598076211


def make_envelope4(floor, gate):
    """envelope as f(r0, rs, sin_psi, cos_psi)."""
    def env(r0, rs, s, c):
        r0 = jnp.asarray(r0, jnp.float32)
        rs = jnp.asarray(rs, jnp.float32)
        s = jnp.asarray(s, jnp.float32)
        t = r0 * s / (_BC * rs) - 1.0
        L = jnp.log1p(1.0 / (jnp.abs(t) + floor))
        if gate:
            L = L * jax.nn.sigmoid(-8.0 * jnp.asarray(c, jnp.float32))
        return (rs / r0) * s * (0.25 + L)
    return env


def run_variant(tag, env4, train_ds, ev, steps):
    # clone loss/eval with the 4-arg envelope
    def loss_fn(params, batch):
        feats = neural.ray_features(
            batch["r0"], batch["rs"], batch["cos_psi"], batch["sin_psi"]
        )
        out = neural.mlp_apply(params, feats)
        delta = env4(
            batch["r0"], batch["rs"], batch["sin_psi"], batch["cos_psi"]
        ) * out[..., 0]
        logit = out[..., 1]
        phi = jnp.arctan2(batch["sin_psi"], batch["cos_psi"]) + delta
        live = 1.0 - batch["captured"]
        dir_err = (jnp.cos(phi) - batch["a"]) ** 2 + (
            jnp.sin(phi) - batch["b"]
        ) ** 2
        dir_loss = jnp.sum(dir_err * live) / jnp.maximum(jnp.sum(live), 1.0)
        cap_loss = jnp.mean(
            jnp.maximum(logit, 0.0)
            - logit * batch["captured"]
            + jnp.log1p(jnp.exp(-jnp.abs(logit)))
        )
        return dir_loss + 0.1 * cap_loss

    real_loss = neural.loss_fn
    real_env = neural.delta_envelope
    neural.loss_fn = loss_fn
    # evaluate/profile call delta_envelope(r0, rs, s): bind c via ev arrays
    t1 = time.time()
    k_fit = jax.random.split(jax.random.PRNGKey(11), 3)[2]
    try:
        res = neural.train(k_fit, train_ds, hidden=(128, 128, 128),
                           steps=steps, batch_size=16384, lr=3e-4)
        neural.delta_envelope = (
            lambda r0, rs, s: env4(r0, rs, s, ev["cos_psi"])
        )
        full = neural.evaluate(res.params, ev)
        out = {
            "tag": tag, "train_s": round(time.time() - t1, 1),
            "final_loss": res.final_loss,
            "loss_tail": [round(float(x), 6) for x in res.loss_history[-5:]],
            "median_deg": full["median_deg"], "p99_deg": full["p99_deg"],
            "capture_acc": full["capture_acc"],
            "profile": profile(res.params, ev),
        }
    finally:
        neural.loss_fn = real_loss
        neural.delta_envelope = real_env
    print(json.dumps(out), flush=True)


def main():
    path = sys.argv[1]
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 150_000
    train_ds, ev = load(path)
    run_variant("env_2e2_gated", make_envelope4(2e-2, True), train_ds, ev, steps)
    run_variant("env_2e2_150k", make_envelope4(2e-2, False), train_ds, ev, steps)


if __name__ == "__main__":
    main()

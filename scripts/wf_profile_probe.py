#!/usr/bin/env python
"""Unwrapped deflection profiles delta(psi) of the oracle dynamics.

For fixed (r0, rs) scenes, trace a dense psi grid, unwrap the final-angle
deflection by continuity from psi=0 (delta(0)=0), and report |delta|
against candidate analytic envelopes:

  E_wf     = (rs / r0) * sin(psi)          (weak-field leading order;
                                            derivation: dphi/ds =
                                            -K(r) sin th cos th over a
                                            straight path integrates to
                                            -(rs/4r0) sin psi)
  E_strong = q^p                            (criticality gate, q = b_c/b)

Goal: find envelopes s.t. delta / E is O(1) and slowly varying, so MLP
head channels stay O(1)-ranged and bf16 output noise becomes relative.
"""

import json
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from bhr_tpu.ops.trace import STATUS_CAPTURED, TraceConfig, trace_rays

SCENES = [
    (30.0, 1.0),
    (60.0, 0.5),
    (15.0, 2.0),
    (6.0, 2.0),
    (45.0, 3.5),
]


def profile(r0, rs, n=8192):
    sin_crit = min(2.598076211 * rs / r0, 1.0)
    psi_crit = np.pi - np.arcsin(sin_crit)
    # dense grid from just above 0 to just inside the critical angle
    psi = np.linspace(1e-3, psi_crit - 1e-4, n).astype(np.float32)
    origins = np.stack(
        [np.full(n, r0), np.zeros(n), np.zeros(n)], -1
    ).astype(np.float32)
    dirs = np.stack([np.cos(psi), np.sin(psi), np.zeros(n)], -1).astype(
        np.float32
    )
    cfg = TraceConfig(dt=0.1)
    res = jax.jit(
        lambda o, d: trace_rays(
            o, d, jnp.zeros(3, jnp.float32), jnp.float32(rs),
            jnp.float32(0.0), 500, cfg,
        )
    )(origins, dirs)
    fv = np.asarray(res.final_vel)
    cap = np.asarray(res.status) == STATUS_CAPTURED
    phi = np.arctan2(fv[:, 1], fv[:, 0])
    dw = np.mod(phi - psi + np.pi, 2 * np.pi) - np.pi
    # unwrap by continuity along psi (captured rays break the chain; stop
    # at the first capture)
    stop = np.argmax(cap) if cap.any() else n
    d = np.unwrap(dw[:stop] + psi[:stop]) - psi[:stop]  # unwrap phi, not dw
    psi = psi[:stop]
    return psi, d, float(psi_crit)


def main():
    for r0, rs in SCENES:
        psi, d, psi_crit = profile(r0, rs)
        q = np.clip(2.598076211 * rs / (r0 * np.sin(psi) + 1e-6), 0, 50)
        e_wf = (rs / r0) * np.sin(psi)
        rows = []
        # sample the profile at geometric q points
        for qt in [0.05, 0.1, 0.2, 0.4, 0.6, 0.8, 0.9, 0.95, 0.99, 0.999]:
            # q is monotone increasing in psi past pi/2; take nearest
            i = int(np.argmin(np.abs(q - qt)))
            if abs(q[i] - qt) / qt > 0.3:
                continue
            rows.append({
                "q": round(float(q[i]), 4),
                "psi_deg": round(float(np.degrees(psi[i])), 2),
                "delta": float(d[i]),
                "delta/E_wf": round(float(d[i] / e_wf[i]), 4),
                "delta/(E_wf*q2)": round(float(d[i] / (e_wf[i] * q[i] ** 2 + 1e-30)), 4),
            })
        print(json.dumps({
            "scene": {"r0": r0, "rs": rs},
            "psi_crit_deg": round(np.degrees(psi_crit), 2),
            "max_|delta|": float(np.max(np.abs(d))),
            "delta_at_last": float(d[-1]),
            "rows": rows,
        }, indent=None))


if __name__ == "__main__":
    main()

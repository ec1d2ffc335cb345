#!/usr/bin/env python
"""Measure the Kerr-Schild oracle's capture boundary vs the b_c(xi) model.

For rays in a plane whose normal has y-component ny (spin axis = +Y,
models/kerr_schild.py), the surrogate's envelopes place the critical-b
log divergence at b = bc_factor_kerr(xi) * rs with xi = a* . ny
(models/neural_kerr.kerr_envelopes). This probe bisects the ACTUAL
capture boundary of the exact Kerr-Schild Hamiltonian oracle
(ops/trace.py, model="kerr") over a grid of plane orientations and
reports the model error in M units — the evidence base for the round-5
envelope upgrade (the round-4 quadratic b_c interpolation is up to
0.49 M off at xi ~ 0.82, misplacing the divergence by ~6 spike widths
and flooring the distillation loss; see measurements/round5/).

Usage: python scripts/kerr_bc_probe.py [--spin 0.9] [--r0 15.81] [--cpu]
"""

import argparse
import json
import pathlib
import sys

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spin", type=float, default=0.9)
    ap.add_argument("--rs", type=float, default=2.0)
    ap.add_argument("--r0", type=float, default=15.81)
    ap.add_argument("--n-ny", type=int, default=17)
    ap.add_argument("--max-steps", type=int, default=2000)
    ap.add_argument("--dt", type=float, default=0.1)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--log", default="")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from bhr_tpu.models.neural_kerr import bc_factor_kerr
    from bhr_tpu.ops.trace import STATUS_CAPTURED, TraceConfig, trace_rays

    rs = args.rs
    m_unit = rs / 2.0
    nys = np.linspace(-1.0, 1.0, args.n_ny).astype(np.float32)
    # plane basis: n_hat has y-component ny; u_hat (origin dir) chosen in
    # the plane orthogonal to n_hat; w_hat = n_hat x u_hat so that
    # n = u x w matches reduce_ray's convention
    nx = np.sqrt(np.maximum(1.0 - nys**2, 0.0))
    n_hat = np.stack([nx, nys, np.zeros_like(nys)], axis=-1)
    ref = np.array([0.0, 0.0, 1.0], np.float32)
    u_hat = np.cross(n_hat, ref)
    u_hat /= np.linalg.norm(u_hat, axis=-1, keepdims=True)
    w_hat = np.cross(n_hat, u_hat)
    origins = jnp.asarray(args.r0 * u_hat, jnp.float32)

    cfg = TraceConfig(dt=args.dt, model="kerr")

    @jax.jit
    def captured(psi):
        d = (
            jnp.cos(psi)[:, None] * u_hat
            + jnp.sin(psi)[:, None] * w_hat
        ).astype(jnp.float32)
        res = trace_rays(
            origins, d, jnp.zeros(3, jnp.float32),
            jnp.float32(rs), jnp.float32(args.spin),
            args.max_steps, cfg,
        )
        return res.status == STATUS_CAPTURED

    # bisect psi in (pi/2, pi): smaller sin(psi) = smaller b = captured
    lo = np.full(args.n_ny, np.pi / 2, np.float64)  # b large -> escapes
    hi = np.full(args.n_ny, np.pi - 1e-4, np.float64)  # b ~ 0 -> captured
    # sanity: orient so hi is captured, lo escapes
    for _ in range(args.iters):
        mid = 0.5 * (lo + hi)
        cap = np.asarray(captured(jnp.asarray(mid, jnp.float32)))
        hi = np.where(cap, mid, hi)
        lo = np.where(cap, lo, mid)
    psi_b = 0.5 * (lo + hi)
    b_meas = args.r0 * np.sin(psi_b) / m_unit  # in M units
    xi = args.spin * nys
    b_model = np.asarray(bc_factor_kerr(xi)) * rs / m_unit
    # the oracle's spin about +Y is LEFT-handed (the Kerr-Schild axis
    # mapping std(x,y,z)->(x,z,y) in models/kerr_schild.py flips
    # orientation), so prograde rays have ny < 0: the effective
    # prograde-ness is -spin*ny
    xi_eff = -xi
    b_exact_eq = xi + 6.0 * np.cos(np.arccos(np.clip(xi, -1, 1)) / 3.0)
    # local-frame correction: the coordinate impact parameter r0 sin(psi)
    # relates to the conserved b = L/E by ~ 1/sqrt(1 - rs/r0)
    # (Schwarzschild static-frame factor, approximate in Kerr)
    red = np.sqrt(max(1.0 - rs / args.r0, 1e-9))
    b_exact_red = b_exact_eq * red
    rows = []
    for i in range(args.n_ny):
        rows.append({
            "ny": round(float(nys[i]), 4),
            "xi": round(float(xi[i]), 4),
            "b_oracle_M": round(float(b_meas[i]), 5),
            "b_model_M": round(float(b_model[i]), 5),
            "b_flip_exact_M": round(float(b_exact_eq[i]), 5),
            "b_flip_exact_red_M": round(float(b_exact_red[i]), 5),
            "model_err_M": round(float(b_model[i] - b_meas[i]), 5),
            "flip_exact_err_M": round(float(b_exact_eq[i] - b_meas[i]), 5),
            "flip_exact_red_err_M": round(
                float(b_exact_red[i] - b_meas[i]), 5
            ),
        })
        print(json.dumps(rows[-1]))
    summary = {
        "spin": args.spin, "rs": rs, "r0": args.r0,
        "max_steps": args.max_steps, "dt": args.dt,
        "model_err_max_M": round(float(np.abs(b_model - b_meas).max()), 5),
        "flip_exact_err_max_M": round(
            float(np.abs(b_exact_eq - b_meas).max()), 5
        ),
        "flip_exact_red_err_max_M": round(
            float(np.abs(b_exact_red - b_meas).max()), 5
        ),
    }
    print(json.dumps(summary))
    if args.log:
        with open(args.log, "a") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
            f.write(json.dumps(summary) + "\n")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Per-ray-step arithmetic op counts for each physics configuration.

Grounds the speed-of-light analysis of the BASELINE config suite: the
geodesic kernel is VPU-op-throughput-bound (zero memory traffic in the hot
loop — docs/DESIGN.md §1), so the expected ms/frame of a config relative
to the 1080p Euler headline is just the ratio of per-step op counts (times
the pixel/step-count ratios). This script traces ONE integration step of
each config through jax.make_jaxpr and tallies the arithmetic primitives —
transcendentals (sqrt/rsqrt/div) weighted separately since the VPU lowers
them to multi-op sequences (scripts/ieee_probe.py: div = recip-estimate +
Newton + mul; sqrt = a*rsqrt(a) + refinement).

Usage: python scripts/opcount.py   (CPU; no TPU needed — counts are
platform-independent jaxpr statistics). Prints one JSON line per config.
"""

import json
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

# VPU cost weights for non-single-op primitives (v5e lowerings; the exact
# multipliers matter less than counting transcendentals at all)
WEIGHTS = {
    "div": 3.0,        # reciprocal estimate + 1 Newton + multiply
    "sqrt": 3.0,       # a * rsqrt(a) + refinement
    "rsqrt": 2.0,      # estimate + refinement (fast tier uses raw estimate)
    "pow": 6.0,
    "integer_pow": 2.0,
    "atan2": 8.0,
    "asin": 8.0,
    "sin": 6.0,
    "cos": 6.0,
    "exp": 6.0,
    "log": 6.0,
}
SKIP = {
    "broadcast_in_dim", "convert_element_type", "reshape", "squeeze",
    "slice", "concatenate", "transpose", "copy", "stop_gradient",
    "reduce_sum", "reduce_max", "reduce_min",  # cross-lane, counted once
}


def count_ops(jaxpr, weights=None) -> tuple[float, Counter]:
    c = Counter()

    def walk(jx):
        for eqn in jx.eqns:
            prim = eqn.primitive.name
            for sub in (v for v in eqn.params.values()):
                pass
            if prim in ("pjit", "closed_call", "custom_jvp_call"):
                inner = eqn.params.get("jaxpr")
                if inner is not None:
                    walk(inner.jaxpr if hasattr(inner, "jaxpr") else inner)
                continue
            c[prim] += 1

    walk(jaxpr.jaxpr)
    w = WEIGHTS if weights is None else weights
    weighted = sum(w.get(p, 1.0) * n for p, n in c.items() if p not in SKIP)
    return weighted, c


def main():
    from bhr_tpu.models import kerr_schild as ks
    from bhr_tpu.ops.geodesic import (
        adaptive_dt,
        euler_step,
        leapfrog_step,
        model_acceleration,
        rk4_step,
    )

    rel = jnp.ones((8, 128, 3), jnp.float32)
    r = jnp.full((8, 128), 5.0, jnp.float32)
    rs, spin, dt = jnp.float32(2.0), jnp.float32(0.0), jnp.float32(0.1)

    def vecstep(step, accel, extra_dt=False):
        def f(p, v, r, rs, spin, dt):
            d = adaptive_dt(r, rs, dt) if extra_dt else dt
            return step(accel, p, v, r, rs, spin, d)

        return jax.make_jaxpr(f)(rel, rel * 0.5, r, rs, spin, dt)

    sch = model_acceleration("schwarzschild")
    configs = {
        "euler_schwarzschild": vecstep(euler_step, sch),
        "rk4_schwarzschild": vecstep(rk4_step, sch),
        "rk4_adaptive": vecstep(rk4_step, sch, extra_dt=True),
        "leapfrog_schwarzschild": vecstep(leapfrog_step, sch),
        "kerr_lt_euler": vecstep(euler_step, model_acceleration("kerr_lt")),
    }

    # exact Kerr-Schild Hamiltonian step (q, p carried; one euler substep)
    def ks_step(q, p, rs, spin, dt):
        dq, dp = ks.derivs(q, p, rs, spin)
        return q + dt * dq, p + dt * dp

    configs["kerr_schild_euler"] = jax.make_jaxpr(ks_step)(
        rel, rel * 0.5, rs, jnp.float32(0.9), dt
    )

    base = None
    for name, jx in configs.items():
        weighted, counts = count_ops(jx)
        if base is None:
            base = weighted
        top = dict(counts.most_common(6))
        print(
            json.dumps(
                {
                    "config": name,
                    "weighted_vpu_ops_per_step": round(weighted, 1),
                    "ratio_vs_euler": round(weighted / base, 2),
                    "top_prims": top,
                }
            ),
            flush=True,
        )

    kernel_roofline()


# ---- fast-tier KERNEL one_step models (the config-4 roofline) -------------
#
# The oracle step functions above overstate the fast Pallas kernel's cost
# (the kernel folds coefficients and uses raw rsqrt / approx-reciprocal).
# These functions mirror ops/pallas_trace.py's fused one_step — mask +
# dt-freeze (l.1011-1032), physics_substep (l.793-834), sl_deriv/sl_rk4
# (l.469-530), adaptive dt (l.1025-1030), disk block (l.1055-1069) — so
# their jaxpr op counts model what the kernel actually executes per ray
# step. Fast-tier weights: rsqrt and approx-reciprocal are single VPU ops.

FAST_WEIGHTS = {"rsqrt": 1.0, "div": 1.0, "sqrt": 1.0}
ESC2, CAP2 = 100.0**2, 2.1**2
R_ISCO, R_OUTER = 6.0, 26.0


def _dot(a, b):
    return a[..., 0] * b[..., 0] + a[..., 1] * b[..., 1] + a[..., 2] * b[..., 2]


def _k_substep_euler(rel, vel, r2, inv_r, rs, dt_eff):
    c = _dot(vel, rel)
    rs_inv_r = rs * inv_r
    one_m = jnp.maximum(1.0 - rs_inv_r, 0.02)
    factor_dt = (rs * (1.0 / (2.0 * r2 * one_m))) * dt_eff
    b1 = 1.0 - factor_dt * one_m
    b2 = factor_dt * (1.0 + rs_inv_r) * c * (inv_r * inv_r)
    nv = vel * b1[..., None] + rel * b2[..., None]
    new_rel = rel + nv * dt_eff[..., None]
    return new_rel, nv * jax.lax.rsqrt(_dot(nv, nv))[..., None]


def _k_deriv(p, v, rs):
    rr2 = _dot(p, p)
    inv_rr = jax.lax.rsqrt(rr2)
    rs_inv = rs * inv_rr
    one_m = jnp.maximum(1.0 - rs_inv, 0.02)
    factor = rs * (1.0 / (2.0 * rr2 * one_m))
    c = _dot(v, p)
    a1 = factor * one_m
    a2 = factor * (1.0 + rs_inv) * c * (inv_rr * inv_rr)
    return p * a2[..., None] - v * a1[..., None]


def _k_rk4(rel, vel, rs, dt_eff):
    half = 0.5 * dt_eff[..., None]
    dt3 = dt_eff[..., None]
    k1v = _k_deriv(rel, vel, rs)
    p2, v2 = rel + vel * half, vel + k1v * half
    k2v = _k_deriv(p2, v2, rs)
    p3, v3 = rel + v2 * half, vel + k2v * half
    k3v = _k_deriv(p3, v3, rs)
    p4, v4 = rel + v3 * dt3, vel + k3v * dt3
    k4v = _k_deriv(p4, v4, rs)
    sixth = dt3 * (1.0 / 6.0)
    kp = vel + 2.0 * (v2 + v3) + v4
    kv = k1v + 2.0 * (k2v + k3v) + k4v
    new_rel = rel + kp * sixth
    nv = vel + kv * sixth
    return new_rel, nv * jax.lax.rsqrt(_dot(nv, nv))[..., None]


def _k_step_euler_headline(rel, vel, rs, dt):
    """Config-3 kernel step: mask + dt-freeze + fused Euler + renorm."""
    r2 = _dot(rel, rel)
    m = ((r2 <= ESC2) & (r2 >= CAP2)).astype(jnp.float32)
    dt_eff = dt * m
    return _k_substep_euler(rel, vel, r2, jax.lax.rsqrt(r2), rs, dt_eff)


def _k_step_config4(rel, vel, rs, dt):
    """Config-4 kernel step: mask + adaptive dt + RK4 + disk block."""
    r2 = _dot(rel, rel)
    m = ((r2 <= ESC2) & (r2 >= CAP2)).astype(jnp.float32)
    rc = r2 * jax.lax.rsqrt(r2)
    dt_eff = dt * jnp.clip((rc - rs) * 0.1, 0.01, 1.0) * m
    old_rel = rel
    rel, vel = _k_rk4(rel, vel, rs, dt_eff)
    oy, ny = old_rel[..., 1], rel[..., 1]
    crosses = oy * ny < 0.0
    den = jnp.where(crosses, ny - oy, 1.0)
    tt = -oy * (1.0 / den)
    hx = old_rel[..., 0] + tt * (rel[..., 0] - old_rel[..., 0])
    hz = old_rel[..., 2] + tt * (rel[..., 2] - old_rel[..., 2])
    hr2 = hx * hx + hz * hz
    hit = crosses & (hr2 >= R_ISCO * R_ISCO) & (hr2 <= R_OUTER * R_OUTER)
    sentinel = jnp.stack([hx, jnp.zeros_like(hx) + 250.0, hz], axis=-1)
    rel = jnp.where(hit[..., None], sentinel, rel)
    return rel, vel


def kernel_roofline():
    """Config-4 floor from kernel-equivalent op counts (VERDICT r3 item 2).

    expected_config4_geodesic = euler_headline_geodesic_ms x op_ratio
    (both one_step models counted with fast-tier weights; VPU-bound, zero
    memory traffic in the loop, same step count and pixel count)."""
    rel = jnp.ones((8, 128, 3), jnp.float32)
    rs, dt = jnp.float32(2.0), jnp.float32(0.1)

    def count(fn):
        jx = jax.make_jaxpr(fn)(rel, rel * 0.5, rs, dt)
        return count_ops(jx, weights=FAST_WEIGHTS)

    w_euler, c_euler = count(_k_step_euler_headline)
    w_c4, c_c4 = count(_k_step_config4)
    # measured burst-window calibration points (BENCHMARKS.md round 3):
    # headline 5.47 ms/frame of which ~0.9 ms is the shading epilogue
    euler_geo_ms = 5.47 - 0.9
    expected_c4 = euler_geo_ms * (w_c4 / w_euler) + 0.9
    print(
        json.dumps(
            {
                "roofline": "config4_rk4_adaptive_disk",
                "kernel_ops_euler_headline": round(w_euler, 1),
                "kernel_ops_config4": round(w_c4, 1),
                "op_ratio": round(w_c4 / w_euler, 2),
                "euler_geodesic_ms_burst": euler_geo_ms,
                "expected_config4_ms_burst": round(expected_c4, 1),
                "top_prims_config4": dict(c_c4.most_common(8)),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()

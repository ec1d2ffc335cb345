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


def count_ops(jaxpr) -> tuple[float, Counter]:
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
    weighted = sum(
        WEIGHTS.get(p, 1.0) * n for p, n in c.items() if p not in SKIP
    )
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


if __name__ == "__main__":
    main()

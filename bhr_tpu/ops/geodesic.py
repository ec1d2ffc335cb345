"""Geodesic integrators: semi-implicit Euler (reference parity), RK4, and
adaptive step sizing.

Euler matches the reference shader exactly (reference:
src/ray_tracer_euler.wgsl:51-90). RK4 and adaptive stepping implement what
the reference roadmap planned (reference: docs/ROADMAP.md:155-231): classic
RK4 on the state (pos, vel) and dt(r) = base_dt * clamp((r - rs) * k, 0.01, 1).

All functions are shape-polymorphic over leading batch dims: `rel`/`vel` are
(..., 3) and `r`/`rs`/`spin`/`dt` broadcast over (...,). They are pure jnp
and power the XLA oracle path (ops/trace.py). The Pallas kernel
re-implements the same formulas on struct-of-arrays component planes
(ops/pallas_trace.py) — a deliberate duplication for register layout, kept
honest by the kernel-vs-oracle parity tests: any physics change here MUST
be mirrored there (tests/test_pallas_parity.py will catch a divergence).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..models import flat, kerr, kerr_schild, schwarzschild

MODELS = {
    "schwarzschild": schwarzschild,
    "kerr": kerr_schild,  # exact Kerr-Schild Hamiltonian geodesics
    "kerr_lt": kerr,  # legacy cheap Lense-Thirring approximation
    "flat": flat,
}

INTEGRATORS = ("euler", "rk4", "leapfrog")


def model_acceleration(model: str):
    """Unified accel(rel, vel, r, rs, spin) for a named spacetime model.

    The exact "kerr" model has no acceleration form — it integrates (q, p)
    in Hamiltonian form (models/kerr_schild.py); ops/trace.py and the
    Pallas kernels branch to it before reaching this lookup.
    """
    if model == "schwarzschild":
        return lambda rel, vel, r, rs, spin: schwarzschild.acceleration(rel, vel, r, rs)
    if model == "kerr_lt":
        return kerr.acceleration
    if model == "flat":
        return flat.acceleration
    if model == "kerr":
        raise ValueError(
            "model 'kerr' is Hamiltonian (Kerr-Schild); it has no "
            "acceleration form — use the dedicated trace path"
        )
    raise ValueError(f"unknown spacetime model {model!r}; have {sorted(MODELS)}")


def model_capture_radius(model: str, rs, spin):
    return MODELS[model].capture_radius(rs, spin)


def euler_step(accel_fn, rel, vel, r, rs, spin, dt):
    """Semi-implicit (symplectic) Euler step (reference: wgsl:80-85).

    v' = v + a(p, v) dt ; p' = p + v' dt  — the position update uses the
    *new* velocity, matching the shader's order exactly.
    """
    a = accel_fn(rel, vel, r, rs, spin)
    dt = _bcast_dt(dt, rel)
    new_vel = vel + a * dt
    new_rel = rel + new_vel * dt
    return new_rel, new_vel


def rk4_step(accel_fn, rel, vel, r, rs, spin, dt):
    """Classic RK4 on state (pos, vel) (reference: docs/ROADMAP.md:169-176).

    d(pos)/dl = vel, d(vel)/dl = accel(pos, vel). Substep radii are guarded
    away from the coordinate singularity at r = rs.
    """
    del r  # recomputed per substep
    dt = _bcast_dt(dt, rel)
    rs_arr = jnp.asarray(rs, jnp.float32)

    def deriv(p, v):
        rr = jnp.sqrt(jnp.sum(p * p, axis=-1))
        rr = jnp.maximum(rr, 1.0001 * jnp.maximum(rs_arr, 1e-6))
        return v, accel_fn(p, v, rr, rs, spin)

    k1p, k1v = deriv(rel, vel)
    k2p, k2v = deriv(rel + 0.5 * dt * k1p, vel + 0.5 * dt * k1v)
    k3p, k3v = deriv(rel + 0.5 * dt * k2p, vel + 0.5 * dt * k2v)
    k4p, k4v = deriv(rel + dt * k3p, vel + dt * k3v)
    sixth = dt * (1.0 / 6.0)
    new_rel = rel + sixth * (k1p + 2.0 * k2p + 2.0 * k3p + k4p)
    new_vel = vel + sixth * (k1v + 2.0 * k2v + 2.0 * k3v + k4v)
    return new_rel, new_vel


def leapfrog_step(accel_fn, rel, vel, r, rs, spin, dt):
    """Kick-drift-kick leapfrog / velocity-Verlet (reference:
    docs/ROADMAP.md:179-190 — the roadmap's symplectic comparator).

    v_half = v + a(p, v) dt/2 ; p' = p + v_half dt ;
    v' = v_half + a(p', v*) dt/2  with one fixed-point correction on v*.

    The geodesic "force" is velocity-dependent, which degrades naive KDK
    to 1st order; one corrector iteration on the final kick (v* =
    v_half + a(p', v_half) dt/2) restores genuine 2nd order (verified by
    tests/test_geodesic.py's convergence-order test) at 3 accel
    evaluations per step — still under RK4's 4. The position-update radii
    are guarded away from r = rs exactly like rk4_step's substeps.
    """
    dt = _bcast_dt(dt, rel)
    half = 0.5 * dt
    a1 = accel_fn(rel, vel, r, rs, spin)
    v_half = vel + a1 * half
    new_rel = rel + v_half * dt
    rs_arr = jnp.asarray(rs, jnp.float32)
    rr = jnp.sqrt(jnp.sum(new_rel * new_rel, axis=-1))
    rr = jnp.maximum(rr, 1.0001 * jnp.maximum(rs_arr, 1e-6))
    a2a = accel_fn(new_rel, v_half, rr, rs, spin)
    v_pred = v_half + a2a * half
    a2 = accel_fn(new_rel, v_pred, rr, rs, spin)
    new_vel = v_half + a2 * half
    return new_rel, new_vel


STEP_FNS = {"euler": euler_step, "rk4": rk4_step, "leapfrog": leapfrog_step}


def adaptive_dt(r, rs, base_dt, k=0.1, lo=0.01, hi=1.0):
    """Distance-scaled step size (reference: docs/ROADMAP.md:195-201).

    dt = base_dt * clamp((r - rs) * k, lo, hi): small careful steps near the
    horizon, long strides far away.
    """
    return base_dt * jnp.clip((r - rs) * k, lo, hi)


def _bcast_dt(dt, rel):
    dt = jnp.asarray(dt, jnp.float32)
    if dt.ndim == rel.ndim - 1:
        dt = dt[..., None]
    return dt

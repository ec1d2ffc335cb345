"""Render diagnostics: numerical health checks for integration results.

The reference roadmap planned conserved-quantity monitoring as its
validation story (reference: docs/ROADMAP.md:234-244 energy-conservation
checks). The approximate Cartesian geodesic system has no exactly conserved
energy, so the practical equivalents here are invariants the integrator
*does* guarantee — unit-speed rays, valid status codes, step-count bounds —
plus distribution summaries useful for spotting regressions (capture
fraction, step histograms).
"""

from __future__ import annotations

import numpy as np

from ..ops.trace import (
    STATUS_CAPTURED,
    STATUS_DISK,
    STATUS_ESCAPED,
    STATUS_RUNNING,
    TraceResult,
)

_VALID_STATUSES = {STATUS_RUNNING, STATUS_ESCAPED, STATUS_CAPTURED, STATUS_DISK}


def trace_diagnostics(result: TraceResult, max_steps: int | None = None) -> dict:
    """Summarize a TraceResult -> plain-python dict of health metrics."""
    status = np.asarray(result.status)
    vel = np.asarray(result.final_vel)
    steps = np.asarray(result.steps)
    n = status.size

    speed = np.linalg.norm(vel, axis=-1)
    live = status != STATUS_CAPTURED  # captured rays' vel is unused
    out = {
        "n_rays": int(n),
        "frac_running": float((status == STATUS_RUNNING).mean()),
        "frac_escaped": float((status == STATUS_ESCAPED).mean()),
        "frac_captured": float((status == STATUS_CAPTURED).mean()),
        "frac_disk": float((status == STATUS_DISK).mean()),
        "invalid_statuses": int((~np.isin(status, list(_VALID_STATUSES))).sum()),
        # rays are renormalized every step (wgsl:166): |v| must be ~1
        "max_speed_error": float(np.abs(speed[live] - 1.0).max()) if live.any() else 0.0,
        "nan_velocities": int(np.isnan(vel[live]).sum()) if live.any() else 0,
        "mean_steps": float(steps.mean()),
        "max_steps_taken": int(steps.max()),
    }
    if max_steps is not None:
        out["steps_exceed_bound"] = int((steps > max_steps).sum())
    return out


def assert_healthy(result: TraceResult, max_steps: int | None = None, tol: float = 1e-4):
    """Raise AssertionError if the trace violates integrator invariants."""
    d = trace_diagnostics(result, max_steps)
    assert d["invalid_statuses"] == 0, f"invalid status codes: {d}"
    assert d["nan_velocities"] == 0, f"NaN velocities on live rays: {d}"
    assert d["max_speed_error"] <= tol, f"|v| drifted from 1: {d}"
    if max_steps is not None:
        assert d["steps_exceed_bound"] == 0, f"steps exceed max_steps: {d}"
    return d

def hamiltonian_drift(q0, d0, rs, spin, dt, n_steps, integrator="leapfrog"):
    """Max |H(q, p)| along exact-Kerr trajectories — the conserved-quantity
    monitor the reference roadmap planned (docs/ROADMAP.md:218-231).

    H = (1/2) g^{uv} p_u p_v = 0 exactly on a null geodesic; its drift over
    `n_steps` of size `dt` measures integrator error directly. The
    symplectic family (semi-implicit euler, leapfrog) shows bounded
    oscillatory drift; non-symplectic RK4 drifts secularly but at O(dt^4).

    q0: (..., 3) start positions rel to the BH; d0: (..., 3) directions.
    Returns a float (max |H| over all rays and steps).
    """
    import jax
    import jax.numpy as jnp

    from ..models import kerr_schild as ks

    q0 = jnp.asarray(q0, jnp.float32)
    d = jnp.asarray(d0, jnp.float32)
    d = d / jnp.sqrt(jnp.sum(d * d, axis=-1, keepdims=True))
    p0 = ks.init_momentum(q0, d, rs, spin)

    def step_euler(q, p):
        _, dp = ks.derivs(q, p, rs, spin)
        p2 = p + dp * dt
        dq2, _ = ks.derivs(q, p2, rs, spin)
        return q + dq2 * dt, p2

    def step_leapfrog(q, p):
        # midpoint-corrected KDK — must match ops/trace.py step_leapfrog
        half = 0.5 * dt
        _, dp1 = ks.derivs(q, p, rs, spin)
        ph = p + dp1 * half
        dq_a, _ = ks.derivs(q, ph, rs, spin)
        q_mid = q + dq_a * half
        dq_b, _ = ks.derivs(q_mid, ph, rs, spin)
        q2 = q + dq_b * dt
        _, dp2a = ks.derivs(q2, ph, rs, spin)
        p_pred = ph + dp2a * half
        _, dp2 = ks.derivs(q2, p_pred, rs, spin)
        return q2, ph + dp2 * half

    def step_rk4(q, p):
        def f(q, p):
            return ks.derivs(q, p, rs, spin)

        k1q, k1p = f(q, p)
        k2q, k2p = f(q + 0.5 * dt * k1q, p + 0.5 * dt * k1p)
        k3q, k3p = f(q + 0.5 * dt * k2q, p + 0.5 * dt * k2p)
        k4q, k4p = f(q + dt * k3q, p + dt * k3p)
        sixth = dt / 6.0
        return (
            q + sixth * (k1q + 2.0 * k2q + 2.0 * k3q + k4q),
            p + sixth * (k1p + 2.0 * k2p + 2.0 * k3p + k4p),
        )

    step = {"euler": step_euler, "leapfrog": step_leapfrog, "rk4": step_rk4}[
        integrator
    ]

    def body(carry, _):
        q, p = carry
        q, p = step(q, p)
        h = ks.hamiltonian(q, p, rs, spin)
        return (q, p), jnp.max(jnp.abs(h))

    _, hs = jax.lax.scan(body, (q0, p0), None, length=n_steps)
    return float(jnp.max(hs))

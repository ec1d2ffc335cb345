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

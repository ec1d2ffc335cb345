"""Schwarzschild spacetime model.

The physics of the reference compute shader (reference:
src/ray_tracer_euler.wgsl:34-41 metric terms, wgsl:51-90 approximate
null-geodesic acceleration in Cartesian coordinates).
"""

from __future__ import annotations

import jax.numpy as jnp


def g_tt(r, rs):
    """Schwarzschild metric tt component (reference: wgsl:34-36)."""
    return -(1.0 - rs / r)


def g_rr(r, rs):
    """Schwarzschild metric rr component (reference: wgsl:39-41)."""
    return 1.0 / (1.0 - rs / r)


def acceleration(rel_pos, vel, r, rs):
    """Approximate null-geodesic acceleration in Cartesian coordinates.

    Matches the shader formula exactly (reference: wgsl:69-79):
        r_vec  = pos / r
        v_rad  = dot(vel, r_vec)
        factor = rs / (2 r^2 (1 - rs/r))
        accel  = -factor * (vel*(1 - rs/r) - r_vec*v_rad*(1 + rs/r))

    `rel_pos`/`vel` are (..., 3); `r`/`rs` broadcast against (...,).
    Caller guarantees r > capture radius so the denominators are safe.
    """
    r = r[..., None]
    rs = jnp.asarray(rs, jnp.float32)
    r_vec = rel_pos / r
    v_rad = jnp.sum(vel * r_vec, axis=-1, keepdims=True)
    rs_over_r = rs / r
    factor = rs / (2.0 * r * r * (1.0 - rs_over_r))
    return -factor * (vel * (1.0 - rs_over_r) - r_vec * v_rad * (1.0 + rs_over_r))


def capture_radius(rs, spin=0.0):
    """Radius below which a ray is considered captured.

    The reference stops at 1.05 * r_s (reference: wgsl:62). `spin` is
    accepted for interface parity with the Kerr model and ignored.
    """
    del spin
    return 1.05 * rs


def photon_sphere_radius(rs):
    """r_ph = 1.5 r_s — analytic invariant used by the test suite."""
    return 1.5 * rs

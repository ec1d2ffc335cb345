"""Lense-Thirring Kerr approximation (registered as model "kerr_lt").

The exact Kerr model is models/kerr_schild.py (Hamiltonian geodesics in
Kerr-Schild coordinates, the reference roadmap's specification —
docs/ROADMAP.md:514-826), registered as "kerr". This module is the *cheap
approximation* tier, in the same approximate-Cartesian spirit as the
reference's Schwarzschild integrator (wgsl:51-90): the Schwarzschild radial
term plus a Lense-Thirring (gravito-magnetic) frame-dragging term, with the
spin-dependent event-horizon radius. ~2.5x fewer flops per step than
Kerr-Schild; qualitatively correct dragging, no photon-ring accuracy.

Conventions: geometric units with r_s = 2M. The spin parameter is the
dimensionless a* = a/M in [0, 1). Spin axis is +Y (the disk/orbit plane of
the app is the XZ equatorial plane, reference: src/main.rs:858-862).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.math import cross
from . import schwarzschild

SPIN_AXIS = jnp.array([0.0, 1.0, 0.0], jnp.float32)


def horizon_radius(rs, spin):
    """Outer event horizon r_+ = M (1 + sqrt(1 - a*^2)), with M = rs/2."""
    m = rs * 0.5
    a = jnp.clip(spin, 0.0, 0.999)
    return m * (1.0 + jnp.sqrt(1.0 - a * a))


def capture_radius(rs, spin=0.0):
    """Capture at 1.05 * r_+ (same safety factor as wgsl:62)."""
    return 1.05 * horizon_radius(rs, jnp.asarray(spin, jnp.float32))


def acceleration(rel_pos, vel, r, rs, spin):
    """Schwarzschild acceleration + Lense-Thirring frame dragging.

    The gravito-magnetic field of a body with angular momentum J = a* M^2
    (spin axis +Y) is, to leading order:

        B_g(r) = (2 J / r^3) * (3 (J_hat . r_hat) r_hat - J_hat) / 2
        a_drag = v x B_g            (photon treated as unit-speed particle)

    This reduces exactly to the reference Schwarzschild formula at spin=0.
    """
    a_schw = schwarzschild.acceleration(rel_pos, vel, r, rs)
    m = jnp.asarray(rs, jnp.float32) * 0.5
    j = jnp.asarray(spin, jnp.float32) * m * m  # J = a* M^2
    r_ = r[..., None]
    r_hat = rel_pos / r_
    j_hat = SPIN_AXIS
    jdotr = jnp.sum(j_hat * r_hat, axis=-1, keepdims=True)
    b_g = (j / (r_ * r_ * r_)) * (3.0 * jdotr * r_hat - j_hat)
    a_drag = cross(vel, b_g)
    return a_schw + a_drag

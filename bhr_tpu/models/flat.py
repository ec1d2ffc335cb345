"""Flat (Minkowski) spacetime: the r_s -> 0 limit.

Net-new vs the reference (which has no tests); used by the test suite as an
analytic invariant — in flat space rays travel in straight lines, so the
rendered image must equal a direct skybox lookup of the primary ray
directions (SURVEY.md section 4).
"""

from __future__ import annotations

import jax.numpy as jnp


def acceleration(rel_pos, vel, r, rs=0.0, spin=0.0):
    del rel_pos, r, rs, spin
    return jnp.zeros_like(vel)


def capture_radius(rs, spin=0.0):
    del spin
    return 1.05 * rs  # rs == 0 in practice -> nothing is captured

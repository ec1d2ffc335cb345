"""Analytic procedural star field: gather-free skybox evaluation.

The reference samples a 4K equirectangular EXR texture per ray
(reference: src/ray_tracer_euler.wgsl:101-105). On TPU, arbitrary 2D
texture gathers are the single slowest operation in the frame (~30 ms per
gather pass at 1080p — two orders of magnitude more than the entire
geodesic integration), so the default skybox is evaluated *analytically*:
a deterministic hash-based star field computed per pixel with pure VPU
arithmetic in the fused shading epilogue. Zero memory traffic, infinite
resolution, bit-identical between the XLA oracle and Pallas paths (both
call this same jnp function outside the kernel).

User-provided textures (EXR/PNG) still use the bilinear gather path in
ops/sampling.py, matching the reference sampler semantics.

Visual recipe mirrors io/skybox.py's texture generator: power-law star
brightness, blue-white..orange temperature tint, a soft sinusoidal
galactic band, and the Reinhard x/(1+x) tone map the reference applies to
its EXR (src/lib.rs:294-303).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

TWO_PI = 6.28318530718
PI = 3.14159265359

# star lattice resolution (cells over the full equirect domain)
GRID_W = 512
GRID_H = 256


def _hash(x):
    """lowbias32-style integer hash on uint32 planes (pure VPU)."""
    x = x.astype(jnp.uint32)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x


def _unit(h):
    """uint32 -> fp32 in [0, 1)."""
    return h.astype(jnp.float32) * jnp.float32(1.0 / 4294967296.0)


def procedural_background(dx, dy, dz, seed: int = 2020):
    """Evaluate the star field for direction planes -> (r, g, b) planes.

    dx/dy/dz are fp32 (...,) direction components (not necessarily unit).
    """
    inv = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz)
    u = 0.5 + jnp.arctan2(dz, dx) / TWO_PI
    v = 0.5 - jnp.arcsin(jnp.clip(dy * inv, -1.0, 1.0)) / PI

    uu = u * GRID_W
    vv = jnp.clip(v, 0.0, 1.0 - 1e-6) * GRID_H
    cx0 = jnp.floor(uu).astype(jnp.int32)
    cy0 = jnp.floor(vv).astype(jnp.int32)

    r = jnp.zeros_like(u)
    g = jnp.zeros_like(u)
    b = jnp.zeros_like(u)
    # 3x3 neighborhood so stars straddling cell borders render whole
    for ddy in (-1, 0, 1):
        for ddx in (-1, 0, 1):
            cx = jnp.mod(cx0 + ddx, GRID_W)  # wrap in U (seam-safe)
            cy = jnp.clip(cy0 + ddy, 0, GRID_H - 1)
            h = _hash(
                cx.astype(jnp.uint32)
                + cy.astype(jnp.uint32) * jnp.uint32(GRID_W)
                + jnp.uint32(seed * 2654435761 & 0xFFFFFFFF)
            )
            h2 = _hash(h)
            h3 = _hash(h2)
            h4 = _hash(h3)
            # star sub-cell position
            su = (cx0 + ddx).astype(jnp.float32) + _unit(h)
            sv = (cy0 + ddy).astype(jnp.float32) + _unit(h2)
            du = uu - su
            dv = vv - sv
            d2 = du * du + dv * dv
            # power-law brightness: u^8 tail, most stars dim, few bright
            t = _unit(h3)
            t2 = t * t
            t4 = t2 * t2
            bright = t4 * t4 * 2.5 + 0.04
            # compact quartic falloff, star core radius ~0.12 cell
            fall = jnp.maximum(0.0, 1.0 - d2 * 18.0)
            glow = fall * fall
            amp = bright * glow * glow
            # temperature tint (same ramp as io/skybox.py)
            temp = _unit(h4)
            r = r + amp * (0.75 + 0.25 * temp)
            g = g + amp * (0.80 + 0.15 * jnp.sin(PI * temp))
            b = b + amp * (1.00 - 0.45 * temp)

    # galactic band (matches io/skybox.py band shape, rational falloff)
    band_center = 0.5 + 0.12 * jnp.sin(TWO_PI * u + 0.7)
    tband = (v - band_center) * (1.0 / 0.075)
    band = 1.0 / (1.0 + tband * tband)
    band = band * band
    r = r + band * 0.035
    g = g + band * 0.033
    b = b + band * 0.045

    # Reinhard x/(1+x), like the EXR ingest (lib.rs:294-303)
    r = r / (1.0 + r)
    g = g / (1.0 + g)
    b = b / (1.0 + b)
    return r, g, b

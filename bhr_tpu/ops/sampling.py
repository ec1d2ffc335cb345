"""Equirectangular skybox sampling and RGBA8 quantization.

Reproduces the wgpu sampler semantics the reference binds for the skybox
(reference: src/lib.rs:414-421): bilinear filtering, address mode Repeat in
U (the panorama wraps at the seam) and ClampToEdge in V, on an Rgba8Unorm
texture (so texels are k/255 values). Texel centers sit at (i + 0.5) / N,
matching GPU normalized texture coordinates.

The gather runs as a fused XLA op *outside* the Pallas geodesic kernel:
rays only need the skybox at termination, so sampling escape directions in
XLA keeps the hot kernel free of HBM gathers (SURVEY.md section 7, hard
parts).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.math import direction_to_equirectangular_uv


def sample_equirect(texture: jnp.ndarray, directions: jnp.ndarray) -> jnp.ndarray:
    """Bilinear equirectangular sample.

    texture: fp32 (H, W, C) with values in [0, 1] (quantized to k/255 by the
    loader, emulating Rgba8Unorm storage). directions: fp32 (..., 3).
    Returns fp32 (..., C).
    """
    uv = direction_to_equirectangular_uv(directions)
    return sample_bilinear(texture, uv[..., 0], uv[..., 1])


def sample_bilinear(texture: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Bilinear texture sample with Repeat-U / Clamp-V addressing."""
    h, w = texture.shape[0], texture.shape[1]
    x = u * w - 0.5
    y = v * h - 0.5
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    fx = (x - x0f)[..., None]
    fy = (y - y0f)[..., None]
    x0 = jnp.mod(x0f.astype(jnp.int32), w)  # Repeat in U (lib.rs:415)
    x1 = jnp.mod(x0 + 1, w)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, h - 1)  # ClampToEdge in V (lib.rs:416)
    y1 = jnp.clip(y0f.astype(jnp.int32) + 1, 0, h - 1)
    t00 = texture[y0, x0]
    t10 = texture[y0, x1]
    t01 = texture[y1, x0]
    t11 = texture[y1, x1]
    top = t00 * (1.0 - fx) + t10 * fx
    bot = t01 * (1.0 - fx) + t11 * fx
    return top * (1.0 - fy) + bot * fy


def quantize_rgba8(rgb: jnp.ndarray, alpha: float = 1.0) -> jnp.ndarray:
    """fp32 (..., 3) in [0,1] -> uint8 (..., 4) RGBA.

    Matches rgba8unorm textureStore conversion (round-to-nearest of
    clamp(v, 0, 1) * 255; reference writes alpha 1.0, wgsl:214).
    """
    rgb = jnp.clip(rgb, 0.0, 1.0)
    q = jnp.round(rgb * 255.0).astype(jnp.uint8)
    a = jnp.full(q.shape[:-1] + (1,), int(round(alpha * 255.0)), jnp.uint8)
    return jnp.concatenate([q, a], axis=-1)

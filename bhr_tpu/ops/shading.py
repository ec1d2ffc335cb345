"""Shading stage: turn integration results into colors.

Implements the termination shading of `trace_ray`/`main` (reference:
src/ray_tracer_euler.wgsl:154-170, 203-211): escaped and step-exhausted rays
sample the skybox with their final velocity, captured rays are black, and
debug mode 1 replaces everything with the step-count heatmap. Disk hits
(roadmap feature) shade with the relativistic thin-disk emission model.

Runs as plain XLA after the geodesic kernel so the skybox gather and the
disk LUT lookup fuse with quantization into one memory-bound epilogue.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.scene import DEBUG_STEPS
from ..models import disk as disk_model
from .heatmap import steps_to_color
from .sampling import quantize_rgba8, sample_equirect
from .trace import STATUS_CAPTURED, STATUS_DISK, TraceResult


def shade(
    result: TraceResult,
    skybox: jnp.ndarray,
    max_steps: int,
    debug_mode: int = 0,
    bh_pos=None,
    rs=None,
    camera_position=None,
    disk_params: disk_model.DiskParams | None = None,
    blackbody_lut: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """TraceResult -> fp32 (..., 3) linear color."""
    if debug_mode == DEBUG_STEPS:
        return steps_to_color(result.steps, max_steps)

    background = sample_equirect(skybox, result.final_vel)[..., :3]
    color = jnp.where(
        (result.status == STATUS_CAPTURED)[..., None],
        jnp.zeros((), jnp.float32),
        background,
    )
    if disk_params is not None:
        hit_rel = result.final_pos - bh_pos
        observer_r = jnp.sqrt(jnp.sum((camera_position - bh_pos) ** 2, axis=-1))
        emission = disk_model.disk_emission(
            hit_rel, result.final_vel, observer_r, rs, disk_params, blackbody_lut
        )
        color = jnp.where((result.status == STATUS_DISK)[..., None], emission, color)
    return color


def shade_to_rgba8(*args, tonemap=None, **kwargs) -> jnp.ndarray:
    """shade() then optional tonemap then rgba8unorm quantization (wgsl:213-214)."""
    color = shade(*args, **kwargs)
    if tonemap is not None:
        color = tonemap(color)
    return quantize_rgba8(color)

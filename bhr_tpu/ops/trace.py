"""Reference tracer: vectorized XLA implementation of the per-pixel
geodesic ray-trace loop.

This is the correctness oracle for the Pallas kernel and the CPU-jax path of
the renderer. The loop reproduces `trace_ray` (reference:
src/ray_tracer_euler.wgsl:138-171) exactly for the Euler/Schwarzschild
configuration:

    for i in 0..max_steps:
        steps = i + 1
        rel = pos - bh;  dist = |rel|
        if dist > 100           -> escaped (background sampled with vel)
        if dist < 1.05 rs       -> captured (black)        # inside geodesic
        step;  pos = rel' + bh;  vel = normalize(vel')

Rays that exhaust max_steps also sample the background with their current
velocity (wgsl:170). The lane-parallel formulation uses masked updates under
one `lax.while_loop` with a global all-done early exit — the TPU-idiomatic
equivalent of per-thread `break` (SURVEY.md section 5, long-context note).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core.scene import CAPTURE_FACTOR, DEFAULT_DT, ESCAPE_RADIUS
from ..models.disk import intersect_equatorial
from .geodesic import STEP_FNS, adaptive_dt, model_acceleration, model_capture_radius

# Ray status codes.
STATUS_RUNNING = 0  # still integrating / exhausted max_steps -> background
STATUS_ESCAPED = 1  # |pos - bh| > escape_radius -> background
STATUS_CAPTURED = 2  # crossed the (padded) horizon -> black
STATUS_DISK = 3  # hit the accretion disk -> disk emission


@dataclasses.dataclass(frozen=True)
class TraceConfig:
    """Static trace configuration (hashable; part of the jit cache key).

    `integrator`/`model` select kernel functions — the TPU-native analog of
    the reference's hot-swappable `--shader` flag (reference: src/main.rs:30).
    """

    integrator: str = "euler"  # "euler" | "rk4"
    model: str = "schwarzschild"  # "schwarzschild" | "kerr" | "flat"
    adaptive: bool = False  # adaptive step size (docs/ROADMAP.md:195-201)
    dt: float = DEFAULT_DT
    escape_radius: float = ESCAPE_RADIUS
    disk: bool = False  # equatorial thin accretion disk
    disk_r_isco_factor: float = 3.0  # in units of r_s
    disk_r_outer_factor: float = 10.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TraceResult:
    """Per-pixel integration outputs, all shaped (..., ) over the pixel grid."""

    final_pos: jnp.ndarray  # (..., 3) absolute position at termination
    final_vel: jnp.ndarray  # (..., 3) unit direction at termination
    status: jnp.ndarray  # (...,) int32 STATUS_*
    steps: jnp.ndarray  # (...,) int32 steps taken (wgsl steps_taken)


def trace_rays(
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    bh_pos: jnp.ndarray,
    rs: jnp.ndarray,
    spin: jnp.ndarray,
    max_steps: int,
    config: TraceConfig = TraceConfig(),
) -> TraceResult:
    """Integrate a batch of rays to termination.

    origins/directions: fp32 (..., 3). bh_pos fp32[3]; rs/spin fp32 scalars.
    """
    accel_fn = model_acceleration(config.model)
    step_fn = STEP_FNS[config.integrator]
    rs = jnp.asarray(rs, jnp.float32)
    spin = jnp.asarray(spin, jnp.float32)
    bh_pos = jnp.asarray(bh_pos, jnp.float32)
    r_capture = model_capture_radius(config.model, rs, spin)
    if config.model == "schwarzschild":
        # keep the literal wgsl:62 expression for bit-parity
        r_capture = rs * CAPTURE_FACTOR
    r_isco = config.disk_r_isco_factor * rs
    r_outer = config.disk_r_outer_factor * rs

    pos0 = jnp.asarray(origins, jnp.float32)
    # wgsl:140: vel = normalize(direction)
    d = jnp.asarray(directions, jnp.float32)
    vel0 = d / jnp.sqrt(jnp.sum(d * d, axis=-1, keepdims=True))
    batch_shape = pos0.shape[:-1]
    status0 = jnp.zeros(batch_shape, jnp.int32)
    steps0 = jnp.zeros(batch_shape, jnp.int32)

    def cond(carry):
        i, pos, vel, status, steps = carry
        return jnp.logical_and(i < max_steps, jnp.any(status == STATUS_RUNNING))

    def body(carry):
        i, pos, vel, status, steps = carry
        active = status == STATUS_RUNNING
        rel = pos - bh_pos
        dist = jnp.sqrt(jnp.sum(rel * rel, axis=-1))
        # steps_taken = i + 1 for every ray still in the loop (wgsl:149)
        steps = jnp.where(active, i + 1, steps)
        escaped = active & (dist > config.escape_radius)
        captured = active & ~escaped & (dist < r_capture)
        stepping = active & ~escaped & ~captured

        dt = (
            adaptive_dt(dist, rs, config.dt)
            if config.adaptive
            else jnp.full_like(dist, config.dt)
        )
        new_rel, new_vel = step_fn(accel_fn, rel, vel, dist, rs, spin, dt)
        new_vel_n = new_vel / jnp.sqrt(
            jnp.sum(new_vel * new_vel, axis=-1, keepdims=True)
        )
        new_pos = new_rel + bh_pos

        if config.disk:
            hit, hit_rel = intersect_equatorial(rel, new_rel, r_isco, r_outer)
            hit = hit & stepping
            new_pos = jnp.where(hit[..., None], hit_rel + bh_pos, new_pos)
            status = jnp.where(hit, STATUS_DISK, status)

        m3 = stepping[..., None]
        pos = jnp.where(m3, new_pos, pos)
        vel = jnp.where(m3, new_vel_n, vel)
        status = jnp.where(escaped, STATUS_ESCAPED, status)
        status = jnp.where(captured, STATUS_CAPTURED, status)
        return i + 1, pos, vel, status, steps

    _, pos, vel, status, steps = jax.lax.while_loop(
        cond, body, (jnp.int32(0), pos0, vel0, status0, steps0)
    )
    return TraceResult(final_pos=pos, final_vel=vel, status=status, steps=steps)

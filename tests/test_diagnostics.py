"""Integrator health diagnostics (the roadmap's conserved-quantity
monitoring analog, docs/ROADMAP.md:234-244)."""

import jax.numpy as jnp
import numpy as np
import pytest

from bhr_tpu.core.camera import Camera, generate_rays
from bhr_tpu.core.scene import SceneParams
from bhr_tpu.ops.trace import TraceConfig, TraceResult, trace_rays
from bhr_tpu.utils.diagnostics import assert_healthy, trace_diagnostics


def _trace(max_steps=300, **cfg):
    cam = Camera.new([0.0, 2.0, 30.0], [0, 0, 0], [0, 1, 0])
    o, d = generate_rays(cam, 48, 32, jnp.float32(np.pi / 3))
    return trace_rays(
        o, d, jnp.zeros(3, jnp.float32), jnp.float32(2.0), jnp.float32(0.0),
        max_steps, TraceConfig(**cfg),
    )


def test_healthy_trace_passes():
    res = _trace()
    d = assert_healthy(res, max_steps=300)
    assert d["frac_captured"] > 0.0
    assert d["frac_running"] + d["frac_escaped"] + d["frac_captured"] == pytest.approx(1.0)
    assert d["max_speed_error"] < 1e-5
    assert d["mean_steps"] <= 300


def test_rk4_also_healthy():
    assert_healthy(_trace(integrator="rk4"), max_steps=300)


def test_unhealthy_trace_detected():
    res = _trace(max_steps=50)
    bad = TraceResult(
        final_pos=res.final_pos,
        final_vel=res.final_vel * 2.0,  # broken normalization
        status=res.status,
        steps=res.steps,
    )
    with pytest.raises(AssertionError):
        assert_healthy(bad, max_steps=50)
    nan = TraceResult(
        final_pos=res.final_pos,
        final_vel=res.final_vel.at[0, 0, 0].set(jnp.nan),
        status=res.status,
        steps=res.steps,
    )
    d = trace_diagnostics(nan)
    assert d["nan_velocities"] >= 1 or d["max_speed_error"] > 0

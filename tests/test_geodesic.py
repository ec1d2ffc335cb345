"""Integrator physics: analytic invariants (net-new; the reference ships no
tests — SURVEY.md §4 derives this strategy)."""

import jax.numpy as jnp
import numpy as np
import pytest

from bhr_tpu.models import kerr, schwarzschild
from bhr_tpu.ops.geodesic import adaptive_dt, euler_step, model_acceleration, rk4_step
from bhr_tpu.ops.trace import (
    STATUS_CAPTURED,
    STATUS_ESCAPED,
    TraceConfig,
    trace_rays,
)


import functools
import jax


@functools.partial(jax.jit, static_argnames=("max_steps", "config"))
def _traced(origin, direction, rs, max_steps, config):
    return trace_rays(
        origin, direction, jnp.zeros(3, jnp.float32), rs, jnp.float32(0.0),
        max_steps, config,
    )


def _trace_single(origin, direction, rs=2.0, max_steps=1000, **cfg):
    return _traced(
        jnp.asarray([origin], jnp.float32),
        jnp.asarray([direction], jnp.float32),
        jnp.float32(rs),
        max_steps,
        TraceConfig(**cfg),
    )


def test_metric_components():
    # g_tt/g_rr sanity (wgsl:34-41)
    assert np.isclose(float(schwarzschild.g_tt(4.0, 2.0)), -0.5)
    assert np.isclose(float(schwarzschild.g_rr(4.0, 2.0)), 2.0)


def test_acceleration_matches_wgsl_formula(rng):
    rel = rng.randn(5, 3).astype(np.float32) * 10
    vel = rng.randn(5, 3).astype(np.float32)
    vel /= np.linalg.norm(vel, axis=-1, keepdims=True)
    r = np.linalg.norm(rel, axis=-1)
    rs = 2.0
    got = np.asarray(
        schwarzschild.acceleration(jnp.asarray(rel), jnp.asarray(vel), jnp.asarray(r), rs)
    )
    # independent numpy transcription of wgsl:69-79
    r_vec = rel / r[:, None]
    v_rad = np.sum(vel * r_vec, axis=-1, keepdims=True)
    factor = (rs / (2 * r * r * (1 - rs / r)))[:, None]
    want = -factor * (vel * (1 - rs / r)[:, None] - r_vec * v_rad * (1 + rs / r)[:, None])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_flat_space_rays_are_straight():
    # r_s -> 0: ray from (0,0,20) toward -Z must exit still pointing -Z
    res = _trace_single([0.0, 0.0, 20.0], [0.0, 0.0, -1.0], rs=0.0, max_steps=1500)
    assert int(res.status[0]) == STATUS_ESCAPED
    np.testing.assert_allclose(
        np.asarray(res.final_vel[0]), [0.0, 0.0, -1.0], atol=1e-5
    )


def test_radial_ray_into_horizon_is_captured():
    res = _trace_single([0.0, 0.0, 20.0], [0.0, 0.0, -1.0], rs=2.0, max_steps=1000)
    assert int(res.status[0]) == STATUS_CAPTURED
    # capture happens at r < 1.05 rs (wgsl:62)
    r_final = np.linalg.norm(np.asarray(res.final_pos[0]))
    assert r_final < 1.05 * 2.0 + 0.2  # one dt=0.1 step of slack


def test_outward_ray_escapes():
    res = _trace_single([0.0, 0.0, 20.0], [0.0, 0.0, 1.0], rs=2.0, max_steps=1000)
    assert int(res.status[0]) == STATUS_ESCAPED
    assert np.asarray(res.final_vel[0])[2] > 0.99


def test_deflection_direction_is_toward_mass():
    # ray passing above the BH (impact parameter +Y) must bend toward -Y
    res = _trace_single([50.0, 6.0, 0.0], [-1.0, 0.0, 0.0], rs=2.0, max_steps=2000)
    assert int(res.status[0]) == STATUS_ESCAPED
    v = np.asarray(res.final_vel[0])
    assert v[1] < -0.01  # bent downward (toward the mass)


def test_closer_impact_parameter_bends_more():
    def deflection(b):
        res = _trace_single([50.0, b, 0.0], [-1.0, 0.0, 0.0], rs=2.0, max_steps=2000)
        assert int(res.status[0]) == STATUS_ESCAPED
        v = np.asarray(res.final_vel[0])
        return abs(np.arctan2(v[1], -v[0]))

    assert deflection(5.0) > deflection(6.0) > deflection(8.0)


def test_photon_sphere_capture_region():
    # rays aimed straight at the photon sphere tangent region: inside
    # ~impact parameter b_crit = 3*sqrt(3)/2 * rs ≈ 5.196 (rs=2) are captured
    def status_for_b(b):
        res = _trace_single([50.0, b, 0.0], [-1.0, 0.0, 0.0], rs=2.0, max_steps=5000)
        return int(res.status[0])

    assert status_for_b(1.0) == STATUS_CAPTURED
    assert status_for_b(12.0) == STATUS_ESCAPED


def test_critical_impact_parameter_bounds():
    """The capture/escape boundary of the approximate physics sits between
    b = 4 and b = 5 (rs = 2, launched from x = 50) — pinned so integrator
    changes that move the shadow edge get caught. (True GR: b_crit =
    3*sqrt(3)/2 * rs ~ 5.196; the approximate Cartesian equation captures
    slightly less.)"""
    def status_for_b(b):
        res = _trace_single([50.0, b, 0.0], [-1.0, 0.0, 0.0], rs=2.0, max_steps=5000)
        return int(res.status[0])

    assert status_for_b(4.0) == STATUS_CAPTURED
    assert status_for_b(5.0) == STATUS_ESCAPED


def test_azimuthal_symmetry():
    # the scene is rotationally symmetric about Y: rotating the launch
    # condition by 90deg about Y rotates the exit direction identically
    res_a = _trace_single([20.0, 3.0, 0.0], [-1.0, 0.0, 0.0], max_steps=2500)
    res_b = _trace_single([0.0, 3.0, 20.0], [0.0, 0.0, -1.0], max_steps=2500)
    va, vb = np.asarray(res_a.final_vel[0]), np.asarray(res_b.final_vel[0])
    # the rotation R with R(20,3,0)=(0,3,20), R(-1,0,0)=(0,0,-1) is
    # (x,y,z) -> (-z, y, x)
    va_rot = np.array([-va[2], va[1], va[0]])
    np.testing.assert_allclose(va_rot, vb, atol=2e-4)
    assert int(res_a.steps[0]) == int(res_b.steps[0])


def test_rk4_converges_to_euler_with_smaller_steps():
    # RK4 with dt=0.1 should land close to Euler with dt=0.0125 (8x refined)
    start, d = [50.0, 6.0, 0.0], [-1.0, 0.0, 0.0]
    res_rk4 = _trace_single(start, d, max_steps=2000, integrator="rk4")
    res_fine = _trace_single(start, d, max_steps=16000, integrator="euler", dt=0.0125)
    assert int(res_rk4.status[0]) == STATUS_ESCAPED
    np.testing.assert_allclose(
        np.asarray(res_rk4.final_vel[0]),
        np.asarray(res_fine.final_vel[0]),
        atol=2e-3,
    )


def test_rk4_more_accurate_than_euler_at_same_dt():
    start, d = [50.0, 6.0, 0.0], [-1.0, 0.0, 0.0]
    truth = np.asarray(
        _trace_single(start, d, max_steps=64000, integrator="rk4", dt=0.003125).final_vel[0]
    )
    e = np.asarray(_trace_single(start, d, max_steps=2000, integrator="euler").final_vel[0])
    r = np.asarray(_trace_single(start, d, max_steps=2000, integrator="rk4").final_vel[0])
    assert np.linalg.norm(r - truth) < np.linalg.norm(e - truth)


def test_adaptive_dt_bounds():
    rs, base = 2.0, 0.1
    d = np.asarray(adaptive_dt(jnp.asarray([2.05, 12.0, 1000.0], jnp.float32), rs, base))
    # near horizon: clamped at 0.01*base; far: clamped at base
    assert np.isclose(d[0], base * 0.01, rtol=1e-4)
    assert np.isclose(d[2], base * 1.0, rtol=1e-6)
    assert base * 0.01 < d[1] <= base


def test_adaptive_trace_still_escapes():
    res = _trace_single(
        [20.0, 6.0, 0.0], [-1.0, 0.0, 0.0], max_steps=4000, adaptive=True
    )
    assert int(res.status[0]) == STATUS_ESCAPED


def test_kerr_zero_spin_equals_schwarzschild(rng):
    rel = rng.randn(4, 3).astype(np.float32) * 8
    vel = rng.randn(4, 3).astype(np.float32)
    r = np.linalg.norm(rel, axis=-1)
    a_k = np.asarray(kerr.acceleration(jnp.asarray(rel), jnp.asarray(vel), jnp.asarray(r), 2.0, 0.0))
    a_s = np.asarray(schwarzschild.acceleration(jnp.asarray(rel), jnp.asarray(vel), jnp.asarray(r), 2.0))
    np.testing.assert_allclose(a_k, a_s, atol=1e-7)


def test_kerr_horizon_shrinks_with_spin():
    assert float(kerr.horizon_radius(2.0, 0.9)) < float(kerr.horizon_radius(2.0, 0.0))
    assert np.isclose(float(kerr.horizon_radius(2.0, 0.0)), 2.0)


def test_kerr_frame_dragging_breaks_mirror_symmetry():
    # equatorial rays passing on opposite sides of a spinning hole deflect
    # by different amounts (prograde vs retrograde)
    def exit_vel(b, spin):
        res = trace_rays(
            jnp.asarray([[30.0, 0.0, b]], jnp.float32),
            jnp.asarray([[-1.0, 0.0, 0.0]], jnp.float32),
            jnp.zeros(3, jnp.float32),
            jnp.float32(2.0),
            jnp.float32(spin),
            4000,
            TraceConfig(model="kerr"),
        )
        assert int(res.status[0]) == STATUS_ESCAPED
        return np.asarray(res.final_vel[0])

    v_plus = exit_vel(8.0, 0.9)
    v_minus = exit_vel(-8.0, 0.9)
    # with zero spin these are mirror images; with spin they are not
    asym = np.abs(v_plus[2] + v_minus[2])
    v0_plus = exit_vel(8.0, 0.0)
    v0_minus = exit_vel(-8.0, 0.0)
    sym = np.abs(v0_plus[2] + v0_minus[2])
    assert asym > 10 * max(sym, 1e-7)


def test_euler_step_semi_implicit_order():
    # position update must use the NEW velocity (wgsl:80-85)
    accel_fn = model_acceleration("schwarzschild")
    rel = jnp.asarray([[10.0, 0.0, 0.0]], jnp.float32)
    vel = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
    r = jnp.asarray([10.0], jnp.float32)
    new_rel, new_vel = euler_step(accel_fn, rel, vel, r, 2.0, 0.0, 0.1)
    expected_rel = np.asarray(rel) + np.asarray(new_vel) * 0.1
    np.testing.assert_allclose(np.asarray(new_rel), expected_rel, rtol=1e-6)


def test_leapfrog_convergence_is_second_order():
    """Halving dt must cut leapfrog's error ~4x (2nd order) on the raw step
    function (no per-step renormalization, which caps the full trace loop
    at 1st order); euler stays ~1st order on the same trajectory."""
    import jax
    import jax.numpy as jnp

    from bhr_tpu.ops.geodesic import STEP_FNS, model_acceleration

    accel_fn = model_acceleration("schwarzschild")
    rel0 = jnp.asarray([[0.0, 0.0, 30.0]], jnp.float32)
    d = np.array([[0.18, 0.0, -1.0]], np.float32)
    vel0 = jnp.asarray(d / np.linalg.norm(d), jnp.float32)
    total_t = 24.0

    def integrate(integ, dt):
        step = STEP_FNS[integ]

        def body(c, _):
            rel, vel = c
            r = jnp.sqrt(jnp.sum(rel * rel, axis=-1))
            rel, vel = step(accel_fn, rel, vel, r, 2.0, 0.0, dt)
            return (rel, vel), None

        (rel, vel), _ = jax.lax.scan(
            body, (rel0, vel0), None, length=int(round(total_t / dt))
        )
        return np.asarray(rel[0], np.float64)

    ref = integrate("rk4", 0.015)
    orders = {}
    for integ in ("euler", "leapfrog"):
        e1 = np.linalg.norm(integrate(integ, 0.24) - ref)
        e2 = np.linalg.norm(integrate(integ, 0.12) - ref)
        orders[integ] = np.log2(e1 / e2)
    assert orders["leapfrog"] > 1.6, orders
    assert orders["euler"] < 1.6, orders


def test_leapfrog_energy_drift_beats_euler():
    """Hamiltonian drift on exact-Kerr flyby null geodesics (conserved-
    quantity check the reference roadmap planned, ROADMAP.md:218-231):
    the 2nd-order leapfrog must hold H ~ 0 far tighter than 1st-order
    semi-implicit euler, quarter its drift when dt halves, and rk4 (4th
    order, non-symplectic) sits below both at these step counts."""
    from bhr_tpu.utils.diagnostics import hamiltonian_drift

    q0 = np.array([[0.0, 1.0, 20.0], [4.0, 2.0, 18.0]], np.float32)
    d0 = np.array([[0.45, -0.02, -1.0], [-0.5, 0.05, -1.0]], np.float32)

    def drift(integ, dt, n):
        return hamiltonian_drift(q0, d0, 2.0, 0.6, dt=dt, n_steps=n,
                                 integrator=integ)

    d_e, d_l, d_r = (drift(i, 0.1, 400) for i in ("euler", "leapfrog", "rk4"))
    assert d_l < 0.05 * d_e, (d_e, d_l)
    assert d_r < d_l, (d_l, d_r)
    # 2nd order: halving dt cuts leapfrog's drift ~4x; euler only ~2x
    ratio_l = d_l / drift("leapfrog", 0.05, 800)
    ratio_e = d_e / drift("euler", 0.05, 800)
    assert ratio_l > 3.0, ratio_l
    assert ratio_e < 3.0, ratio_e


def test_leapfrog_renders_and_is_close_to_rk4():
    """integrator="leapfrog" must render end-to-end and produce a frame
    close to rk4's (both 2nd+ order at dt=0.1, far from chaos at 200 steps)."""
    from bhr_tpu import BlackHoleRenderer, Camera, SceneParams

    scene = SceneParams(screen_width=48, screen_height=32, max_steps=200)
    cam = Camera.default()
    frames = {}
    for integ in ("leapfrog", "rk4"):
        r = BlackHoleRenderer(48, 32, integ)
        frames[integ] = np.asarray(r.render_frame(cam, scene)).astype(int)
    d = np.abs(frames["leapfrog"] - frames["rk4"])[..., :3]
    assert (d > 32).mean() < 0.02, (d.max(), (d > 32).mean())

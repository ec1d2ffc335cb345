"""Accretion disk model (roadmapped feature, docs/ROADMAP.md:285-470) and
heatmap/starfield shading units."""

import jax.numpy as jnp
import numpy as np

from bhr_tpu.models.disk import (
    DiskParams,
    blackbody_lut,
    disk_temperature,
    intersect_equatorial,
    keplerian_velocity,
    redshift_factor,
    temperature_to_color,
)
from bhr_tpu.ops.heatmap import steps_to_color
from bhr_tpu.ops.starfield import procedural_background


def test_intersect_equatorial_hit_and_miss():
    old = jnp.asarray([[8.0, 1.0, 0.0], [8.0, 1.0, 0.0], [20.0, 1.0, 0.0]])
    new = jnp.asarray([[8.0, -1.0, 0.0], [8.0, 0.5, 0.0], [20.0, -1.0, 0.0]])
    hit, pos = intersect_equatorial(old, new, r_isco=6.0, r_outer=18.0)
    hit = np.asarray(hit)
    assert hit.tolist() == [True, False, False]  # crossing in annulus / no crossing / outside r_outer
    np.testing.assert_allclose(np.asarray(pos)[0], [8.0, 0.0, 0.0], atol=1e-6)


def test_keplerian_velocity_tangential_subluminal():
    p = jnp.asarray([[8.0, 0.0, 0.0]])
    v = np.asarray(keplerian_velocity(p, rs=2.0))[0]
    assert abs(np.dot(v, [1, 0, 0])) < 1e-6  # tangent to radius
    assert abs(v[1]) < 1e-6  # in-plane
    speed = np.linalg.norm(v)
    np.testing.assert_allclose(speed, np.sqrt(1.0 / 8.0), rtol=1e-5)  # sqrt(M/r)


def test_redshift_prograde_vs_retrograde():
    # material approaching the observer (prograde side) is blueshifted:
    # g < 1 by the roadmap's convention (ROADMAP.md:374-397)
    hit = jnp.asarray([[8.0, 0.0, 0.0]])
    v_dir = np.asarray(keplerian_velocity(hit, rs=2.0))[0]
    toward = jnp.asarray([v_dir / np.linalg.norm(v_dir)])
    away = -toward
    g_blue = float(redshift_factor(hit, toward, observer_r=100.0, rs=2.0)[0])
    g_red = float(redshift_factor(hit, away, observer_r=100.0, rs=2.0)[0])
    assert g_blue < 1.0 < g_red


def test_disk_temperature_profile():
    # T(r) = T_isco (r/r_isco)^-0.75
    t1 = float(disk_temperature(6.0, 6.0, 10000.0))
    t2 = float(disk_temperature(12.0, 6.0, 10000.0))
    assert np.isclose(t1, 10000.0)
    assert np.isclose(t2, 10000.0 * 2 ** -0.75, rtol=1e-5)


def test_blackbody_lut_hues():
    lut = np.asarray(blackbody_lut())
    assert lut.shape == (512, 3)
    assert lut.min() >= 0.0 and lut.max() <= 1.0
    cold = np.asarray(temperature_to_color(jnp.asarray([2000.0])))[0]
    hot = np.asarray(temperature_to_color(jnp.asarray([25000.0])))[0]
    assert cold[0] > cold[2]  # cold: red-dominant
    assert hot[2] > hot[0]  # hot: blue-dominant


def test_disk_params_for_scene():
    p = DiskParams.for_scene(2.0)
    assert float(p.r_isco) == 6.0 and float(p.r_outer) == 20.0


def test_heatmap_endpoints_and_order():
    c = np.asarray(steps_to_color(jnp.asarray([0, 25, 50, 75, 100]), 100))
    np.testing.assert_allclose(c[0], [0, 0, 1], atol=1e-6)  # blue
    np.testing.assert_allclose(c[1], [0, 1, 1], atol=1e-6)  # cyan
    np.testing.assert_allclose(c[2], [0, 1, 0], atol=1e-6)  # green
    np.testing.assert_allclose(c[3], [1, 1, 0], atol=1e-6)  # yellow
    np.testing.assert_allclose(c[4], [1, 0, 0], atol=1e-6)  # red


def test_procedural_background_deterministic_and_bounded():
    rng = np.random.RandomState(0)
    d = rng.randn(64, 3).astype(np.float32)
    dx, dy, dz = (jnp.asarray(d[:, i]) for i in range(3))
    r1, g1, b1 = procedural_background(dx, dy, dz, seed=1)
    r2, g2, b2 = procedural_background(dx, dy, dz, seed=1)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    for c in (r1, g1, b1):
        c = np.asarray(c)
        assert c.min() >= 0.0 and c.max() <= 1.0
    r3, _, _ = procedural_background(dx, dy, dz, seed=2)
    assert not np.array_equal(np.asarray(r1), np.asarray(r3))


def test_procedural_background_scale_invariant():
    # direction is normalized internally — scaled inputs match
    d = jnp.asarray([[0.3, -0.2, 0.9]])
    a = procedural_background(d[:, 0], d[:, 1], d[:, 2])
    b = procedural_background(d[:, 0] * 5, d[:, 1] * 5, d[:, 2] * 5)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


def test_select_lut_matches_gather_lut():
    """The gather-free clamp-sum LUT (multires epilogue) tracks the 512-entry
    gather lerp within ~1.5 u8 levels across the whole temperature range,
    and is EXACT (same piecewise-linear curve) at coarse=LUT_STEPS."""
    from bhr_tpu.models.disk import (
        LUT_STEPS,
        LUT_T_MAX,
        LUT_T_MIN,
        temperature_to_color,
        temperature_to_color_select,
    )

    t = jnp.linspace(LUT_T_MIN - 500.0, LUT_T_MAX + 500.0, 4001)
    ref = np.asarray(temperature_to_color(t))
    full = np.asarray(temperature_to_color_select(t, coarse=LUT_STEPS))
    np.testing.assert_allclose(full, ref, atol=2e-6)
    coarse = np.asarray(temperature_to_color_select(t, coarse=64))
    assert np.abs(coarse - ref).max() < 1.5 / 255.0


def test_disk_emission_select_mode_close():
    from bhr_tpu.models.disk import DiskParams, blackbody_lut, disk_emission

    params = DiskParams.for_scene(2.0)
    pos = jnp.asarray([[7.0, 0.0, 1.0], [-12.0, 0.0, 3.0]])
    d = jnp.asarray([[0.0, 1.0, 0.0], [0.5, 0.5, 0.0]])
    a = np.asarray(disk_emission(pos, d, 15.0, 2.0, params, blackbody_lut()))
    b = np.asarray(disk_emission(pos, d, 15.0, 2.0, params, "select"))
    assert np.abs(a - b).max() < 0.02

"""Hosek-Wilkie sky model tests: state construction, radiance evaluation,
and parity spot-checks against values derived from the reference's tables."""

import numpy as np
import pytest

from rayfinder_tpu.sky import (
    SkyParams,
    sky_state_new,
    sky_radiance,
    sun_direction_from_zenith_azimuth,
)
from rayfinder_tpu.sky.model import SOLAR_RADIUS_RADIANS, _tables, sky_radiance_dist


def test_param_validation():
    with pytest.raises(ValueError):
        sky_state_new(SkyParams(elevation=-0.1))
    with pytest.raises(ValueError):
        sky_state_new(SkyParams(elevation=0.5, turbidity=0.5))
    with pytest.raises(ValueError):
        sky_state_new(SkyParams(elevation=0.5, albedo=(2.0, 0.0, 0.0)))


def test_state_shapes():
    state = sky_state_new(SkyParams(elevation=np.radians(60.0)))
    assert state.params.shape == (3, 9)
    assert state.sky_radiances.shape == (3,)
    assert state.solar_radiances.shape == (3,)
    np.testing.assert_allclose(np.linalg.norm(state.sun_direction), 1.0, rtol=1e-6)


def test_solar_radiance_interpolation_matches_table():
    # At integer turbidity the solar radiance is the table value directly
    # (hw_skymodel.c:127-139).
    tables = _tables()
    state = sky_state_new(SkyParams(elevation=0.5, turbidity=1.0))
    np.testing.assert_allclose(
        state.solar_radiances,
        [tables[f"solar_radiances_{c}"][0] for c in "rgb"],
        rtol=1e-6,
    )
    state5 = sky_state_new(SkyParams(elevation=0.5, turbidity=5.5))
    for ch_idx, ch in enumerate("rgb"):
        tab = tables[f"solar_radiances_{ch}"]
        expected = 0.5 * (tab[4] + tab[5])
        np.testing.assert_allclose(state5.solar_radiances[ch_idx], expected, rtol=1e-5)


def test_sky_brighter_toward_sun():
    state = sky_state_new(SkyParams(elevation=np.radians(60.0)))
    # Looking at the sun's elevation vs opposite azimuth, same theta.
    theta = np.float32(np.radians(30.0))
    toward = sky_radiance_dist(state, theta, np.float32(0.05))
    away = sky_radiance_dist(state, theta, np.float32(np.pi * 0.9))
    assert np.all(np.asarray(toward) > np.asarray(away))


def test_solar_disk_only_inside_radius():
    state = sky_state_new(SkyParams(elevation=np.radians(60.0)))
    inside = np.asarray(sky_radiance(state, 0.5, SOLAR_RADIUS_RADIANS * 0.5))
    outside = np.asarray(sky_radiance(state, 0.5, SOLAR_RADIUS_RADIANS * 1.5))
    base = np.asarray(sky_radiance_dist(state, 0.5, SOLAR_RADIUS_RADIANS * 1.5))
    np.testing.assert_allclose(outside, base, rtol=1e-6)
    assert np.all(inside - np.asarray(sky_radiance_dist(state, 0.5, SOLAR_RADIUS_RADIANS * 0.5)) > 1e5)


def test_sun_direction_formula():
    # aligned_sky_state.hpp:54-57: zenith 0 => straight up.
    np.testing.assert_allclose(
        sun_direction_from_zenith_azimuth(0.0, 0.0), [0, 1, 0], atol=1e-7
    )
    d = sun_direction_from_zenith_azimuth(np.radians(90.0), 0.0)
    np.testing.assert_allclose(d, [1, 0, 0], atol=1e-6)
    d = sun_direction_from_zenith_azimuth(np.radians(90.0), np.radians(90.0))
    np.testing.assert_allclose(d, [0, 0, -1], atol=1e-6)


def test_radiance_positive_over_dome():
    state = sky_state_new(SkyParams(elevation=np.radians(45.0)))
    thetas = np.linspace(0.0, np.pi / 2 - 0.01, 32, dtype=np.float32)
    gammas = np.linspace(0.0, np.pi, 32, dtype=np.float32)
    tt, gg = np.meshgrid(thetas, gammas)
    vals = np.asarray(sky_radiance_dist(state, tt.ravel(), gg.ravel()))
    assert np.all(np.isfinite(vals))
    assert np.all(vals > 0.0)

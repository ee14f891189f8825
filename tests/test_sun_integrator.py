"""Sun integrator: the ported spectral pipeline must regenerate the runtime
solar radiance tables (which the reference produced with this exact tool,
src/hw-sunmodel-integrator/main.cpp:136-242)."""

import numpy as np

from rayfinder_tpu.sky.model import _tables
from rayfinder_tpu.sky.solar import (
    WAVELENGTHS,
    cie1931_x,
    cie1931_y,
    cie1931_z,
    solar_disk_radiance,
    spectral_to_srgb,
)


def test_integrator_reproduces_solar_tables():
    from rayfinder_tpu.tools.sun_integrator import integrate_sun_disks

    means, disks = integrate_sun_disks(64)
    baked = _tables()
    for ch, name in enumerate("rgb"):
        table = baked[f"solar_radiances_{name}"]
        np.testing.assert_allclose(means[:, ch], table, rtol=5e-6)
    assert len(disks) == 10


def test_limb_darkening_dims_the_rim():
    """Radiance at the disk rim must be darker than at the center
    (ArHosekSkyModel.c:416-436)."""
    center = solar_disk_radiance(1.0, 0.0, 0.5, 560.0)
    from rayfinder_tpu.sky.solar import TERRESTRIAL_SOLAR_RADIUS

    rim = solar_disk_radiance(1.0, TERRESTRIAL_SOLAR_RADIUS * 0.98, 0.5, 560.0)
    assert 0 < rim < center


def test_cie_fits_peak_near_expected_wavelengths():
    waves = np.linspace(360, 700, 1000)
    assert abs(waves[np.argmax(cie1931_x(waves))] - 599.8) < 5.0
    assert abs(waves[np.argmax(cie1931_y(waves))] - 556.0) < 10.0
    assert abs(waves[np.argmax(cie1931_z(waves))] - 449.0) < 10.0


def test_flat_spectrum_is_nearly_white():
    rgb = spectral_to_srgb(WAVELENGTHS, np.ones(len(WAVELENGTHS)))
    assert rgb.min() > 0
    assert rgb.max() / rgb.min() < 1.6


def test_spectral_sky_dome():
    """Full spectral model (SpectralSkyState): finite, positive over the
    dome, brighter toward the sun, and its sRGB projection within a loose
    factor of the runtime RGB fit."""
    import numpy as np
    from rayfinder_tpu.sky.solar import SpectralSkyState, spectral_to_srgb, WAVELENGTHS
    from rayfinder_tpu.sky.model import SkyParams, sky_state_new, sky_radiance_dist

    elev = np.radians(60.0)
    state = SpectralSkyState(elev, turbidity=3.0, albedo=0.5)
    assert np.isfinite(state.configs).all() and np.isfinite(state.radiances).all()

    theta = np.radians(40.0)
    toward, away = 0.1, 2.5
    rad_toward = [state.skydome_radiance(theta, toward, wl) for wl in WAVELENGTHS]
    rad_away = [state.skydome_radiance(theta, away, wl) for wl in WAVELENGTHS]
    assert all(r > 0 for r in rad_toward)
    assert sum(rad_toward) > sum(rad_away)

    # Inside the solar disk the direct term dominates by orders of magnitude.
    assert state.solar_radiance(elev, 0.0, 560.0) > 100.0 * state.skydome_radiance(
        elev, 0.0, 560.0
    )

    # sRGB projection vs the runtime RGB fit: same ballpark (the RGB fit is
    # an independent approximation; expect agreement within ~2x).
    srgb = spectral_to_srgb(
        WAVELENGTHS, np.asarray([state.skydome_radiance(theta, toward, wl) for wl in WAVELENGTHS])
    )
    rgb_fit = sky_state_new(
        SkyParams(elevation=float(elev), turbidity=3.0, albedo=(0.5, 0.5, 0.5))
    )
    fit = np.asarray(sky_radiance_dist(rgb_fit, theta, toward))
    ratio = srgb / fit
    assert np.all(ratio > 0.4) and np.all(ratio < 2.5), ratio

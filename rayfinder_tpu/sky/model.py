"""Simplified RGB Hosek-Wilkie sky model.

Port of the reference's hw-skymodel runtime (src/hw-skymodel/hw_skymodel.c):
a 33-float sky state (27 Perez-style params, 3 sky radiances, 3 solar-disk
radiances) built on the host by quintic Bézier interpolation over
t = (elevation / (π/2))^(1/3), bilinearly blended over turbidity ∈ [1, 10]
and albedo ∈ [0, 1] (hw_skymodel.c:64-139), then evaluated per-direction on
device (hw_skymodel.c:182-223, reference_path_tracer.wgsl:247-275).

The fit tables are baked from the reference's data headers into
assets/sky_tables.npz as [albedo(2), turbidity(10), knot(6), param(9)] /
[albedo, turbidity, knot] arrays (see tools/bake_assets.py).
"""

from __future__ import annotations

import functools
import pathlib
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

SOLAR_RADIUS_RADIANS = np.float32(0.004450589)  # 0.255 degrees (hw_skymodel.c:16)

_ASSETS = pathlib.Path(__file__).resolve().parent.parent / "assets"


class SkyParams(NamedTuple):
    """hw_skymodel.h:8-16. elevation in radians ∈ [0, π/2], turbidity ∈ [1, 10],
    per-channel ground albedo ∈ [0, 1]."""

    elevation: float
    turbidity: float = 1.0
    albedo: tuple[float, float, float] = (1.0, 1.0, 1.0)


class SkyState(NamedTuple):
    """Device-friendly packed state (hw_skymodel.h:18-23 + sun direction,
    matching the WGSL SkyState struct, aligned_sky_state.hpp:28-33)."""

    params: np.ndarray  # (3, 9) f32: RGB x Perez params
    sky_radiances: np.ndarray  # (3,) f32
    solar_radiances: np.ndarray  # (3,) f32
    sun_direction: np.ndarray  # (3,) f32


@functools.cache
def _tables() -> dict[str, np.ndarray]:
    with np.load(_ASSETS / "sky_tables.npz") as data:
        return {k: data[k] for k in data.files}


# Bernstein weights of the quintic Bézier (hw_skymodel.c:18-62).
def _quintic_weights(t: float) -> np.ndarray:
    t = np.float32(t)
    it = np.float32(1.0) - t
    return np.asarray(
        [it**5, 5 * it**4 * t, 10 * it**3 * t**2, 10 * it**2 * t**3, 5 * it * t**4, t**5],
        dtype=np.float32,
    )


def _turbidity_blend(turbidity: float) -> tuple[int, int, np.float32]:
    t_int = int(turbidity)
    t_rem = np.float32(np.fmod(np.float32(turbidity), np.float32(1.0)))
    assert t_int > 0
    t_min = t_int - 1
    t_max = min(t_int, 9)
    return t_min, t_max, t_rem


def sun_direction_from_zenith_azimuth(zenith_radians: float, azimuth_radians: float) -> np.ndarray:
    """World-space unit sun direction (aligned_sky_state.hpp:54-57):
    y up, azimuth 0 along +x, positive azimuth toward -z."""
    d = np.asarray(
        [
            np.sin(zenith_radians) * np.cos(azimuth_radians),
            np.cos(zenith_radians),
            -np.sin(zenith_radians) * np.sin(azimuth_radians),
        ],
        dtype=np.float32,
    )
    return d / np.linalg.norm(d)


def sky_state_new(params: SkyParams, sun_direction=None) -> SkyState:
    """Host-side state construction (hw_skymodel.c:141-180).

    Raises ValueError when parameters are out of range (the reference's
    sky_state_result error codes)."""
    elevation = float(params.elevation)
    turbidity = float(params.turbidity)
    albedo = np.asarray(params.albedo, dtype=np.float32)

    if not 0.0 <= elevation <= np.pi:
        raise ValueError("elevation out of range [0, pi]")
    if not 1.0 <= turbidity <= 10.0:
        raise ValueError("turbidity out of range [1, 10]")
    if np.any(albedo < 0.0) or np.any(albedo > 1.0):
        raise ValueError("albedo out of range [0, 1]")

    t = np.float32((elevation / (0.5 * np.pi)) ** (1.0 / 3.0))
    w = _quintic_weights(t)  # (6,)
    t_min, t_max, t_rem = _turbidity_blend(turbidity)
    tables = _tables()

    out_params = np.zeros((3, 9), dtype=np.float32)
    out_sky = np.zeros((3,), dtype=np.float32)
    out_solar = np.zeros((3,), dtype=np.float32)
    for ch_idx, ch in enumerate("rgb"):
        a = albedo[ch_idx]
        # Bilinear blend weights over (albedo, turbidity) corners
        # (hw_skymodel.c:82-85).
        s = np.asarray(
            [(1 - a) * (1 - t_rem), (1 - a) * t_rem, a * (1 - t_rem), a * t_rem],
            dtype=np.float32,
        )
        p = tables[f"params_{ch}"]  # (2, 10, 6, 9)
        corners = np.stack(
            [p[0, t_min], p[0, t_max], p[1, t_min], p[1, t_max]]
        )  # (4, 6, 9)
        out_params[ch_idx] = np.einsum("c,k,ckp->p", s, w, corners, dtype=np.float32)

        r = tables[f"radiances_{ch}"]  # (2, 10, 6)
        r_corners = np.stack([r[0, t_min], r[0, t_max], r[1, t_min], r[1, t_max]])
        out_sky[ch_idx] = np.einsum("c,k,ck->", s, w, r_corners, dtype=np.float32)

        solar = tables[f"solar_radiances_{ch}"]  # (10,)
        out_solar[ch_idx] = solar[t_min] * (1 - t_rem) + solar[t_max] * t_rem

    if sun_direction is None:
        # elevation measured from the horizon: zenith = pi/2 - elevation.
        sun_direction = sun_direction_from_zenith_azimuth(0.5 * np.pi - elevation, 0.0)
    return SkyState(
        params=out_params,
        sky_radiances=out_sky,
        solar_radiances=out_solar,
        sun_direction=np.asarray(sun_direction, dtype=np.float32),
    )


def sky_state_from_ui(turbidity, albedo, sun_zenith_degrees, sun_azimuth_degrees) -> SkyState:
    """Build a SkyState from the UI-style parameters (aligned_sky_state.hpp:15-23)."""
    zen = np.float32(np.radians(sun_zenith_degrees))
    azi = np.float32(np.radians(sun_azimuth_degrees))
    return sky_state_new(
        SkyParams(elevation=float(0.5 * np.pi - zen), turbidity=float(turbidity), albedo=tuple(albedo)),
        sun_direction=sun_direction_from_zenith_azimuth(zen, azi),
    )


def sky_radiance_dist(state: SkyState, theta, gamma):
    """Perez-style sky dome radiance WITHOUT the solar disk, batched over
    direction angles. Matches the WGSL skyRadiance (wgsl:247-275) used by the
    path tracer (which adds the sun via next-event estimation only).

    theta/gamma: (...,) f32. Returns (..., 3)."""
    p = jnp.asarray(state.params)  # (3, 9)
    r = jnp.asarray(state.sky_radiances)  # (3,)
    theta = jnp.asarray(theta, jnp.float32)[..., None]
    gamma = jnp.asarray(gamma, jnp.float32)[..., None]

    cos_gamma = jnp.cos(gamma)
    cos_gamma2 = cos_gamma * cos_gamma
    cos_theta = jnp.abs(jnp.cos(theta))

    exp_m = jnp.exp(p[:, 4] * gamma)
    ray_m = cos_gamma2
    mie_m = (1.0 + cos_gamma2) / jnp.power(
        1.0 + p[:, 8] * p[:, 8] - 2.0 * p[:, 8] * cos_gamma, jnp.float32(1.5)
    )
    zenith = jnp.sqrt(cos_theta)
    radiance_lhs = 1.0 + p[:, 0] * jnp.exp(p[:, 1] / (cos_theta + jnp.float32(0.01)))
    radiance_rhs = (
        p[:, 2] + p[:, 3] * exp_m + p[:, 5] * ray_m + p[:, 6] * mie_m + p[:, 7] * zenith
    )
    return r * radiance_lhs * radiance_rhs


def sky_radiance(state: SkyState, theta, gamma):
    """Full radiance including the constant solar disk (hw_skymodel.c:182-223):
    the CPU-demo semantics. Returns (..., 3)."""
    base = sky_radiance_dist(state, theta, gamma)
    solar = jnp.asarray(state.solar_radiances)
    in_disk = (jnp.asarray(gamma, jnp.float32) / SOLAR_RADIUS_RADIANS <= 1.0)[..., None]
    return base + jnp.where(in_disk, solar, jnp.float32(0.0))

from .model import SkyParams, SkyState, sky_state_new, sky_radiance, sun_direction_from_zenith_azimuth

__all__ = [
    "SkyParams",
    "SkyState",
    "sky_state_new",
    "sky_radiance",
    "sun_direction_from_zenith_azimuth",
]

"""Sampling noise: tiled blue-noise texture animated by an R2 offset.

Matches the reference's `animatedBlueNoise` (reference_path_tracer.wgsl:602-616):
the per-pixel 2D noise is the 128x128 blue-noise tile value (u8/255,
src/pt/reference_path_tracer.cpp:168-184) plus the frame's golden-ratio R2
offset, wrapped to [0, 1). One 2D value is used for every sampling decision a
pixel makes in a given frame, exactly as in the reference.
"""

from __future__ import annotations

import functools
import pathlib

import numpy as np
import jax.numpy as jnp

_ASSETS = pathlib.Path(__file__).resolve().parent.parent / "assets"

# wgsl:609-610
_A1 = np.float32(0.7548776662466927)
_A2 = np.float32(0.5698402909980532)


@functools.cache
def blue_noise_tile() -> np.ndarray:
    """(128, 128, 2) float32 tile in [0, 1]."""
    with np.load(_ASSETS / "blue_noise.npz") as data:
        tile = data["tile"]
    return (tile.astype(np.float32) / np.float32(255.0)).astype(np.float32)


def animated_blue_noise(coords_y, coords_x, frame_idx, total_sample_count, tile=None):
    """Per-pixel animated 2D noise (wgsl:602-616).

    coords_y/coords_x: integer pixel coordinates (top-left origin), any shape.
    frame_idx: scalar frame counter; total_sample_count: scalar spp.
    Returns (..., 2) float32 in [0, 1).
    """
    if tile is None:
        tile = jnp.asarray(blue_noise_tile())
    h, w = tile.shape[0], tile.shape[1]
    base = tile[coords_y % h, coords_x % w]
    n = jnp.asarray(frame_idx % total_sample_count, jnp.float32)
    r2 = jnp.stack([_A1 * n, _A2 * n], axis=-1)
    r2 = r2 - jnp.floor(r2)
    out = base + r2
    return out - jnp.floor(out)

"""Thin-lens camera (reference: src/common/camera.{hpp,cpp}).

The camera basis is precomputed on the host into a NamedTuple of float32
vectors and consumed by jitted ray-generation code. (u, v) are in [0, 1] with
(0, 0) the lower-left corner (camera.hpp:32-34).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp


class Camera(NamedTuple):
    origin: np.ndarray  # (3,) f32
    lower_left_corner: np.ndarray
    horizontal: np.ndarray
    vertical: np.ndarray
    up: np.ndarray
    right: np.ndarray
    lens_radius: np.ndarray  # () f32


def create_camera(
    origin,
    look_at,
    aperture: float,
    focus_distance: float,
    vfov_degrees: float,
    aspect_ratio: float,
) -> Camera:
    """camera.cpp:7-42, in float32."""
    origin = np.asarray(origin, dtype=np.float32)
    look_at = np.asarray(look_at, dtype=np.float32)

    theta = math.radians(vfov_degrees)
    half_height = np.float32(focus_distance * math.tan(0.5 * theta))
    half_width = np.float32(aspect_ratio) * half_height

    world_up = np.array([0.0, 1.0, 0.0], dtype=np.float32)
    forward = look_at - origin
    forward = forward / np.linalg.norm(forward)
    right = np.cross(forward, world_up)
    right = (right / np.linalg.norm(right)).astype(np.float32)
    up = np.cross(right, forward).astype(np.float32)

    lower_left = origin - half_width * right - half_height * up + np.float32(focus_distance) * forward

    return Camera(
        origin=origin,
        lower_left_corner=lower_left.astype(np.float32),
        horizontal=(2.0 * half_width * right).astype(np.float32),
        vertical=(2.0 * half_height * up).astype(np.float32),
        up=up,
        right=right,
        lens_radius=np.float32(0.5 * aperture),
    )


def generate_camera_ray(camera: Camera, u, v):
    """Pinhole primary ray for (u, v) batches (camera.cpp:44-51).

    u, v: (...,) arrays. Returns (origin, direction) of shape (..., 3).
    """
    u = jnp.asarray(u, jnp.float32)[..., None]
    v = jnp.asarray(v, jnp.float32)[..., None]
    direction = (
        camera.lower_left_corner + u * camera.horizontal + v * camera.vertical - camera.origin
    )
    direction = direction / jnp.linalg.norm(direction, axis=-1, keepdims=True)
    origin = jnp.broadcast_to(jnp.asarray(camera.origin), direction.shape)
    return origin, direction


def generate_camera_ray_lens(camera: Camera, noise, u, v):
    """Thin-lens primary ray with a blue-noise lens sample
    (reference_path_tracer.wgsl:236-245). noise: (..., 2) in [0, 1)."""
    from .sampling import point_in_unit_disk

    lens_point = jnp.float32(camera.lens_radius) * point_in_unit_disk(noise)
    lens_offset = (
        lens_point[..., 0:1] * jnp.asarray(camera.right)
        + lens_point[..., 1:2] * jnp.asarray(camera.up)
    )
    origin = jnp.asarray(camera.origin) + lens_offset
    u = jnp.asarray(u, jnp.float32)[..., None]
    v = jnp.asarray(v, jnp.float32)[..., None]
    direction = (
        camera.lower_left_corner + u * camera.horizontal + v * camera.vertical - origin
    )
    direction = direction / jnp.linalg.norm(direction, axis=-1, keepdims=True)
    return jnp.broadcast_to(origin, direction.shape), direction

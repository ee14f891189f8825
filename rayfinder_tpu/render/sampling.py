"""Direction sampling primitives (reference_path_tracer.wgsl:567-600,309-319).

All functions are elementwise over batches; `u` arguments are uniform random
numbers in [0, 1) with a trailing dimension of 2.
"""

from __future__ import annotations

import jax.numpy as jnp

TWO_PI = jnp.float32(2.0 * jnp.pi)


def pixar_onb(n):
    """Branchless orthonormal basis from a unit normal (wgsl:309-319,
    Duff et al., "Building an Orthonormal Basis, Revisited", JCGT 2017).

    n: (..., 3). Returns (u, v, n) basis vectors, each (..., 3).
    """
    s = jnp.where(n[..., 2] >= 0.0, jnp.float32(1.0), jnp.float32(-1.0))
    a = jnp.float32(-1.0) / (s + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    u = jnp.stack(
        [jnp.float32(1.0) + s * n[..., 0] * n[..., 0] * a, s * b, -s * n[..., 0]],
        axis=-1,
    )
    v = jnp.stack([b, s + n[..., 1] * n[..., 1] * a, -n[..., 1]], axis=-1)
    return u, v, n


def _onb_transform(basis, local):
    u, v, n = basis
    return (
        local[..., 0:1] * u + local[..., 1:2] * v + local[..., 2:3] * n
    )


def direction_in_cone(u, cos_theta_max):
    """Uniform direction in a +z cone (wgsl:567-579)."""
    cos_theta = jnp.float32(1.0) - u[..., 0] * (jnp.float32(1.0) - cos_theta_max)
    sin_theta = jnp.sqrt(jnp.float32(1.0) - cos_theta * cos_theta)
    phi = TWO_PI * u[..., 1]
    return jnp.stack(
        [jnp.cos(phi) * sin_theta, jnp.sin(phi) * sin_theta, cos_theta], axis=-1
    )


def direction_in_cosine_weighted_hemisphere(u):
    """Cosine-weighted +z hemisphere direction (wgsl:581-592)."""
    phi = TWO_PI * u[..., 1]
    sin_theta = jnp.sqrt(jnp.float32(1.0) - u[..., 0])
    return jnp.stack(
        [jnp.cos(phi) * sin_theta, jnp.sin(phi) * sin_theta, jnp.sqrt(u[..., 0])],
        axis=-1,
    )


def point_in_unit_disk(u):
    """Uniform point in the unit disk (wgsl:594-600)."""
    r = jnp.sqrt(u[..., 0])
    theta = TWO_PI * u[..., 1]
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)


def sample_solar_disk_direction(u, cos_theta_max, sun_direction):
    """World-space direction toward the solar disk (wgsl:287-292).

    The basis is built at the sun direction's own (3,) shape — it is constant
    across lanes, and XLA does not sink broadcasts through the ONB's division,
    so building it per lane costs a dozen (B, 3) ops for nothing."""
    local = direction_in_cone(u, cos_theta_max)
    basis = pixar_onb(sun_direction)
    return _onb_transform(tuple(jnp.broadcast_to(b, local.shape) for b in basis), local)


def sample_cosine_hemisphere(u, n):
    """World-space cosine-weighted hemisphere direction about n
    (evalImplicitLambertian, wgsl:294-301)."""
    local = direction_in_cosine_weighted_hemisphere(u)
    return _onb_transform(pixar_onb(n), local)

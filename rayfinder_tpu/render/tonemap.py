"""Tonemapping: ACES filmic fit + gamma 2.2 (reference_path_tracer.wgsl:59-63,
277-285)."""

from __future__ import annotations

import jax.numpy as jnp


def aces_filmic(x):
    """Narkowicz's ACES filmic curve fit, saturated to [0, 1] (wgsl:277-285)."""
    a, b, c, d, e = (jnp.float32(v) for v in (2.51, 0.03, 2.43, 0.59, 0.14))
    return jnp.clip((x * (a * x + b)) / (x * (c * x + d) + e), 0.0, 1.0)


def tonemap(linear_rgb, exposure):
    """exposure-scaled ACES + gamma 2.2 encode → [0, 1] sRGB-ish output
    (fsMain, wgsl:59-63)."""
    rgb = aces_filmic(jnp.float32(exposure) * linear_rgb)
    return jnp.power(rgb, jnp.float32(1.0 / 2.2))


def expose_sigmoid(x, exposure):
    """The hw-skymodel-demo's exposure curve 2/(1+exp(-e*x)) - 1
    (src/hw-skymodel-demo/main.cpp expose())."""
    return jnp.float32(2.0) / (jnp.float32(1.0) + jnp.exp(-jnp.float32(exposure) * x)) - jnp.float32(1.0)

"""Small math helpers shared across the framework.

Semantics follow the reference's utility headers
(src/common/math.hpp:7-17, src/common/r_sequence.hpp:11-22,
src/common/units/angle.hpp:9-36) but are vectorized over numpy/jax arrays.
"""

from __future__ import annotations

import numpy as np


def fract(x):
    """Fractional part, rounding toward zero for negative inputs.

    Matches src/common/math.hpp:7-17: x - floor(x) for x >= 0, x - ceil(x)
    otherwise (so fract(-1.25) == -0.25, unlike GLSL's fract).
    Works on numpy and jax arrays alike.
    """
    xp = np
    try:  # dispatch to jax.numpy when handed traced values
        import jax.numpy as jnp

        if not isinstance(x, (float, int, np.ndarray, np.generic)):
            xp = jnp
    except ImportError:  # pragma: no cover
        pass
    x = xp.asarray(x)
    return xp.where(x >= 0, x - xp.floor(x), x - xp.ceil(x))


def gpu_fract(x):
    """GLSL/WGSL fract: x - floor(x), always in [0, 1)."""
    xp = np
    try:
        import jax.numpy as jnp

        if not isinstance(x, (float, int, np.ndarray, np.generic)):
            xp = jnp
    except ImportError:  # pragma: no cover
        pass
    x = xp.asarray(x)
    return x - xp.floor(x)


# Plastic-constant additive recurrence (src/common/r_sequence.hpp:14-16).
_R2_G = np.float32(1.32471795)
_R2_A1 = np.float32(1.0) / _R2_G
_R2_A2 = np.float32(1.0) / (_R2_G * _R2_G)


def r2_sequence(n, sequence_length):
    """2D quasirandom R2 sequence point(s) for index n (mod sequence_length).

    Matches src/common/r_sequence.hpp:11-22. Returns an array with a trailing
    dimension of 2.
    """
    i = np.float32(np.asarray(n) % sequence_length)
    x = fract(np.float32(0.5) + _R2_A1 * i)
    y = fract(np.float32(0.5) + _R2_A2 * i)
    return np.stack([x, y], axis=-1)


def degrees_to_radians(deg):
    return np.asarray(deg, dtype=np.float32) * np.float32(np.pi / 180.0)

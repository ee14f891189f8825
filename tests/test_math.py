"""Math utility tests (patterns from src/tests/math.cpp, aabb.cpp)."""

import numpy as np

from rayfinder_tpu.utils.math import fract, gpu_fract, r2_sequence


def test_fract_positive():
    assert np.isclose(fract(1.25), 0.25)
    assert np.isclose(fract(0.0), 0.0)


def test_fract_negative_rounds_toward_zero():
    # src/tests/math.cpp:5-14: fract(-1.25) == -0.25 (not GLSL's 0.75).
    assert np.isclose(fract(-1.25), -0.25)


def test_gpu_fract_wraps():
    assert np.isclose(gpu_fract(-1.25), 0.75)
    assert np.isclose(gpu_fract(2.5), 0.5)


def test_r2_sequence_in_unit_square():
    pts = r2_sequence(np.arange(100), 100)
    assert pts.shape == (100, 2)
    assert np.all(pts >= 0.0) and np.all(pts < 1.0)
    # Consecutive points differ by the plastic-constant step, mod 1.
    deltas = np.diff(pts, axis=0) % 1.0
    assert np.allclose(deltas[:, 0], deltas[0, 0], atol=1e-5)

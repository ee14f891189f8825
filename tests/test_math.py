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


def test_angle_type():
    """src/common/units/angle.hpp:9-36 semantics in f32."""
    import numpy as np
    import pytest

    from rayfinder_tpu.utils.math import Angle

    a = Angle.degrees(90.0)
    assert a.as_radians() == np.float32(90.0) * np.float32(np.pi) / np.float32(180.0)
    assert np.isclose(a.as_degrees(), 90.0)
    b = Angle.radians(0.5)
    assert (b + b).as_radians() == np.float32(1.0)
    assert b < a
    assert not (a < b)
    with pytest.raises(TypeError):
        Angle(1.0)  # private constructor, factories only


def test_extent2_type():
    """src/common/extent.hpp:7-45: equality, cast, aspect ratio, area."""
    import numpy as np

    from rayfinder_tpu.utils.math import Extent2

    e = Extent2(1920, 1080)
    assert e == Extent2(1920, 1080)
    assert e != Extent2(1280, 720)
    assert np.isclose(e.aspect_ratio(), 1920.0 / 1080.0)
    assert e.area() == 1920 * 1080
    f = e.astype(np.float32)
    assert f.x == np.float32(1920.0) and f.dtype == np.float32
    # Integer area stays in the component dtype (reference: T area).
    assert isinstance(Extent2(3, 4).area(), np.int32)


def test_bit_flags_type():
    """src/common/bit_flags.hpp:13-52: variadic init, has/add, none/all."""
    import enum

    from rayfinder_tpu.utils.math import BitFlags

    class F(enum.IntEnum):
        A = 1
        B = 2
        C = 4

    fl = BitFlags(F.A, F.C)
    assert fl.has(F.A) and fl.has(F.C) and not fl.has(F.B)
    fl.add(F.B)
    assert fl.has(F.B)
    assert not BitFlags.none().has(F.A)
    assert BitFlags.all(F).has(F.B)
    # has() of a multi-bit query requires ALL bits (reference semantics).
    multi = BitFlags(F.A)
    assert not multi.has(F.A | F.B)
    multi.add(F.B)
    assert multi.has(F.A | F.B)

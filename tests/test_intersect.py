"""Ray-primitive kernel tests (patterns of src/tests/intersection.cpp,
src/tests/aabb.cpp)."""

import numpy as np
import jax
import jax.numpy as jnp

from rayfinder_tpu.render.intersect import offset_ray, ray_aabb, ray_triangle


def _single_triangle():
    v0 = jnp.asarray([[-1.0, -1.0, 2.0]], jnp.float32)
    v1 = jnp.asarray([[1.0, -1.0, 2.0]], jnp.float32)
    v2 = jnp.asarray([[0.0, 1.0, 2.0]], jnp.float32)
    return v0, v1, v2


def test_ray_triangle_hit():
    # src/tests/intersection.cpp:9-28: ray through the triangle's interior.
    v0, v1, v2 = _single_triangle()
    o = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    hit, t, u, v = ray_triangle(o, d, v0, v1, v2, jnp.float32(1e4))
    assert bool(hit[0])
    np.testing.assert_allclose(float(t[0]), 2.0, rtol=1e-6)
    p = np.asarray(o[0] + t[0] * d[0])
    np.testing.assert_allclose(p, [0.0, 0.0, 2.0], atol=1e-5)


def test_ray_triangle_miss_and_backface_hits():
    v0, v1, v2 = _single_triangle()
    o = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
    # Pointing away: t < 0 -> miss.
    d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
    hit, *_ = ray_triangle(o, d, v0, v1, v2, jnp.float32(1e4))
    assert not bool(hit[0])
    # Outside the triangle: miss.
    d = jnp.asarray([[0.9, 0.9, 1.0]], jnp.float32)
    hit, *_ = ray_triangle(o, d, v0, v1, v2, jnp.float32(1e4))
    assert not bool(hit[0])
    # From behind: Möller-Trumbore is double-sided (det < -eps accepted).
    o = jnp.asarray([[0.0, 0.0, 4.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
    hit, t, _, _ = ray_triangle(o, d, v0, v1, v2, jnp.float32(1e4))
    assert bool(hit[0]) and np.isclose(float(t[0]), 2.0)


def test_ray_triangle_respects_tmax():
    v0, v1, v2 = _single_triangle()
    o = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    hit, *_ = ray_triangle(o, d, v0, v1, v2, jnp.float32(1.5))
    assert not bool(hit[0])


def _aabb_test(o, d, lo, hi, t_max=1e4):
    o = jnp.asarray([o], jnp.float32)
    d = jnp.asarray([d], jnp.float32)
    inv = 1.0 / d
    neg = inv < 0
    return bool(
        ray_aabb(
            o,
            inv,
            neg,
            jnp.asarray([lo], jnp.float32),
            jnp.asarray([hi], jnp.float32),
            jnp.float32(t_max),
        )[0]
    )


def test_ray_aabb_cases():
    lo, hi = [-1, -1, -1], [1, 1, 1]
    # Straight through the middle (src/tests/aabb.cpp ray-slab cases).
    assert _aabb_test([0, 0, -5], [0, 0, 1], lo, hi)
    # From inside.
    assert _aabb_test([0, 0, 0], [0, 0, 1], lo, hi)
    # Pointing away.
    assert not _aabb_test([0, 0, -5], [0, 0, -1], lo, hi)
    # Parallel miss.
    assert not _aabb_test([0, 5, -5], [0, 0, 1], lo, hi)
    # Diagonal corner hit.
    assert _aabb_test([-5, -5, -5], [1, 1, 1], lo, hi)
    # Beyond t_max.
    assert not _aabb_test([0, 0, -5], [0, 0, 1], lo, hi, t_max=3.0)
    # Negative direction components.
    assert _aabb_test([5, 5, 5], [-1, -1, -1], lo, hi)


def test_offset_ray_moves_off_surface():
    p = jnp.asarray([[1.0, 10.0, 0.001]], jnp.float32)
    n = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    po = np.asarray(offset_ray(p, n))[0]
    # Offset along +n in every component with a nonzero normal.
    assert po[2] > 0.001
    assert po[0] == 1.0 and po[1] == 10.0
    # Mantissa offset is scale-invariant: relative shift, not absolute.
    p2 = jnp.asarray([[1000.0, 0.0, 0.0]], jnp.float32)
    n2 = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
    po2 = np.asarray(offset_ray(p2, n2))[0]
    assert po2[0] > 1000.0
    assert (po2[0] - 1000.0) > (po[2] - 0.001)

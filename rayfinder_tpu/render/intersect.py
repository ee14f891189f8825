"""Ray-primitive intersection kernels in jax.numpy (float32 throughout).

Numerics match the reference's CPU and WGSL kernels so that golden-image
comparisons converge:

* Möller-Trumbore with EPSILON = 1e-5 (src/common/ray_intersection.cpp:38-90,
  src/pt/reference_path_tracer.wgsl:477-521);
* slab ray-AABB test with precomputed inverse direction and per-axis
  direction signs (ray_intersection.cpp:92-136, wgsl:447-475);
* self-intersection avoidance via integer-mantissa ray offsetting
  (ray_intersection.cpp:17-35, wgsl:523-544).

All functions are batched: rays have shape (..., 3) and broadcast against
triangle/AABB operands.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPSILON = jnp.float32(1e-5)
T_MIN = jnp.float32(1e-3)
T_MAX = jnp.float32(1e4)

_ORIGIN = jnp.float32(1.0 / 32.0)
_FLOAT_SCALE = jnp.float32(1.0 / 65536.0)
_INT_SCALE = jnp.float32(256.0)


def offset_ray(p, n, int_scale=_INT_SCALE, float_scale=_FLOAT_SCALE):
    """Scale-invariant surface offset along n (ray_intersection.cpp:17-35).

    Adds an integer offset directly into the float mantissa except near the
    origin, where a fixed epsilon is used instead. The deferred renderer's
    lighting pass uses different scales (INT_SCALE=1024, FLOAT_SCALE=1/16384,
    deferred_renderer_lighting_pass.wgsl:500-502).
    """
    offset = (jnp.float32(int_scale) * n).astype(jnp.int32)
    p_bits = jax.lax.bitcast_convert_type(p, jnp.int32)
    po_bits = p_bits + jnp.where(p < 0, -offset, offset)
    po = jax.lax.bitcast_convert_type(po_bits, jnp.float32)
    return jnp.where(jnp.abs(p) < _ORIGIN, p + jnp.float32(float_scale) * n, po)


def ray_triangle(origin, direction, v0, v1, v2, t_max):
    """Möller-Trumbore single-hit test, elementwise over broadcast batches.

    Returns (hit, t, u, v): hit is bool; t/u/v are valid only where hit.
    Mirrors wgsl:477-521 (the barycentric b = (1-u-v, u, v)).
    """
    e1 = v1 - v0
    e2 = v2 - v0
    h = jnp.cross(direction, e2)
    det = jnp.sum(e1 * h, axis=-1)
    inv_det = jnp.float32(1.0) / det
    s = origin - v0
    u = inv_det * jnp.sum(s * h, axis=-1)
    q = jnp.cross(s, e1)
    v = inv_det * jnp.sum(direction * q, axis=-1)
    t = inv_det * jnp.sum(e2 * q, axis=-1)

    hit = (
        (jnp.abs(det) >= EPSILON)
        & (u >= 0.0)
        & (u <= 1.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > EPSILON)
        & (t < t_max)
    )
    return hit, t, u, v


def ray_aabb(origin, inv_dir, dir_neg, aabb_min, aabb_max, t_max):
    """Slab test (ray_intersection.cpp:101-136). dir_neg is bool (..., 3).

    The reference rejects early when the x/y slabs are disjoint before
    intersecting the z slab; the vectorized form computes all three and
    reproduces the same accept set, including its asymmetric </> comparisons.
    """
    near = jnp.where(dir_neg, aabb_max, aabb_min)
    far = jnp.where(dir_neg, aabb_min, aabb_max)
    t0 = (near - origin) * inv_dir
    t1 = (far - origin) * inv_dir

    tmin_xy = jnp.maximum(t0[..., 0], t0[..., 1])
    tmax_xy = jnp.minimum(t1[..., 0], t1[..., 1])
    fail_xy = (t0[..., 0] > t1[..., 1]) | (t0[..., 1] > t1[..., 0])

    fail_z = (tmin_xy > t1[..., 2]) | (t0[..., 2] > tmax_xy)
    tmin = jnp.maximum(tmin_xy, t0[..., 2])
    tmax = jnp.minimum(tmax_xy, t1[..., 2])

    return ~fail_xy & ~fail_z & (tmin < t_max) & (tmax > 0.0)


def brute_force_closest_hit(origin, direction, triangles, t_max):
    """All-triangles closest hit: the oracle for BVH traversal tests and the
    dense path for tiny scenes (pattern of src/tests/bvh.cpp:34-101).

    origin/direction: (R, 3); triangles: (T, 3, 3).
    Returns (hit, t, tri_idx) each of shape (R,).
    """
    o = origin[:, None, :]
    d = direction[:, None, :]
    hit, t, _, _ = ray_triangle(
        o, d, triangles[None, :, 0], triangles[None, :, 1], triangles[None, :, 2], t_max
    )
    t_masked = jnp.where(hit, t, jnp.inf)
    tri_idx = jnp.argmin(t_masked, axis=-1)
    best_t = jnp.take_along_axis(t_masked, tri_idx[:, None], axis=-1)[:, 0]
    any_hit = jnp.isfinite(best_t)
    return any_hit, jnp.where(any_hit, best_t, t_max), jnp.where(any_hit, tri_idx, -1)

"""Pallas TPU kernels for cluster-sweep ray traversal.

The XLA wavefront walk (render/wavefront.py) is HBM-bound: every walk step
gathers (chunk, L, 3, 3) triangle blocks out to HBM and reads them back. These
kernels keep the whole cluster table **resident in VMEM** (Duck: 0.15 MB,
Sponza at 262K tris: 9.4 MB — both fit the ~16 MB budget) and sweep clusters
per ray tile:

* grid over ray tiles of TILE rays; rays live in VMEM registers;
* one vectorized slab pass computes every (cluster, ray) entry distance into
  a (C, TILE) scratch — elementwise VPU work, broadcast (C,1) x (1,TILE);
* a `fori_loop` sweeps clusters in leaf (spatial) order; a tile is tested
  against cluster c only when some lane still needs it
  (`entry[c] < best_t`), via `lax.cond` — the TPU analog of BVH pruning;
* dense Möller-Trumbore of (TILE, L) per tested cluster, numerics identical
  to render/intersect.py (EPSILON 1e-5, same accept tests,
  reference: src/pt/reference_path_tracer.wgsl:477-521).

Outputs are (t, padded triangle slot) per ray; callers map slots through
cluster_tri_map. Correctness is pinned against the XLA walk in
tests/test_pallas_walk.py.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPSILON = np.float32(1e-5)  # plain numpy: a jnp scalar would be captured as a traced constant
TILE = 512  # rays per grid step


def _slab_entry_rows(aabb_min_ref, aabb_max_ref, ox, oy, oz, ix, iy, iz, tmax):
    """(C, TILE) entry distances; +inf where the slab test fails.

    Same accept set as ray_intersection.cpp:101-136.
    """
    # Mirrors render/wavefront._slab_entry (and ray_intersection.cpp:101-136)
    # exactly, including its NaN comparison semantics for axis-parallel rays.
    def axis_ts(mins, maxs, o, inv):
        neg = inv < 0.0
        near_b = jnp.where(neg[None, :], maxs[:, None], mins[:, None])
        far_b = jnp.where(neg[None, :], mins[:, None], maxs[:, None])
        t0 = (near_b - o[None, :]) * inv[None, :]
        t1 = (far_b - o[None, :]) * inv[None, :]
        return t0, t1

    t0x, t1x = axis_ts(aabb_min_ref[0, :], aabb_max_ref[0, :], ox, ix)
    t0y, t1y = axis_ts(aabb_min_ref[1, :], aabb_max_ref[1, :], oy, iy)
    t0z, t1z = axis_ts(aabb_min_ref[2, :], aabb_max_ref[2, :], oz, iz)

    tmin_xy = jnp.maximum(t0x, t0y)
    tmax_xy = jnp.minimum(t1x, t1y)
    fail_xy = (t0x > t1y) | (t0y > t1x)
    fail_z = (tmin_xy > t1z) | (t0z > tmax_xy)
    tmin = jnp.maximum(tmin_xy, t0z)
    tmax_box = jnp.minimum(tmax_xy, t1z)

    hit = ~fail_xy & ~fail_z & (tmin < tmax[None, :]) & (tmax_box > 0.0)
    return jnp.where(hit, jnp.maximum(tmin, 0.0), jnp.inf)


def _mt_block(v, ox, oy, oz, dx, dy, dz, t_bound):
    """Möller-Trumbore of TILE rays vs one (9, L) vertex block.

    v rows: v0x v0y v0z v1x v1y v1z v2x v2y v2z. Returns (t, slot):
    per-ray min-t over the block (inf when no accept) and its lane index.
    """
    v0x, v0y, v0z = v[0][None, :], v[1][None, :], v[2][None, :]
    e1x = v[3][None, :] - v0x
    e1y = v[4][None, :] - v0y
    e1z = v[5][None, :] - v0z
    e2x = v[6][None, :] - v0x
    e2y = v[7][None, :] - v0y
    e2z = v[8][None, :] - v0z

    dxc, dyc, dzc = dx[:, None], dy[:, None], dz[:, None]
    # h = d x e2
    hx = dyc * e2z - dzc * e2y
    hy = dzc * e2x - dxc * e2z
    hz = dxc * e2y - dyc * e2x
    det = e1x * hx + e1y * hy + e1z * hz
    inv_det = jnp.float32(1.0) / det

    sx = ox[:, None] - v0x
    sy = oy[:, None] - v0y
    sz = oz[:, None] - v0z
    u = inv_det * (sx * hx + sy * hy + sz * hz)
    # q = s x e1
    qx = sy * e1z - sz * e1y
    qy = sz * e1x - sx * e1z
    qz = sx * e1y - sy * e1x
    vv = inv_det * (dxc * qx + dyc * qy + dzc * qz)
    t = inv_det * (e2x * qx + e2y * qy + e2z * qz)

    ok = (
        (jnp.abs(det) >= EPSILON)
        & (u >= 0.0) & (u <= 1.0)
        & (vv >= 0.0) & (u + vv <= 1.0)
        & (t > EPSILON) & (t < t_bound[:, None])
    )
    t_masked = jnp.where(ok, t, jnp.inf)
    slot = jnp.argmin(t_masked, axis=1)
    t_best = jnp.min(t_masked, axis=1)
    return t_best, slot.astype(jnp.int32)


def _closest_kernel(
    o_ref, d_ref, tmax_ref, aabb_min_ref, aabb_max_ref, table_ref,
    t_out_ref, tri_out_ref, entry_scratch,
):
    num_clusters, _, leaf = table_ref.shape

    ox, oy, oz = o_ref[0, 0, :], o_ref[0, 1, :], o_ref[0, 2, :]
    dx, dy, dz = d_ref[0, 0, :], d_ref[0, 1, :], d_ref[0, 2, :]
    tmax = tmax_ref[0, 0, :]
    ix = jnp.float32(1.0) / dx
    iy = jnp.float32(1.0) / dy
    iz = jnp.float32(1.0) / dz

    entry_scratch[:, :] = _slab_entry_rows(
        aabb_min_ref, aabb_max_ref, ox, oy, oz, ix, iy, iz, tmax
    )

    def body(c, carry):
        best_t, best_tri = carry
        e = entry_scratch[c, :]
        need = e < best_t

        def test(_):
            v = table_ref[c]  # (9, L)
            t_cand, slot = _mt_block(v, ox, oy, oz, dx, dy, dz, best_t)
            better = need & (t_cand < best_t)
            new_t = jnp.where(better, t_cand, best_t)
            new_tri = jnp.where(better, c * leaf + slot, best_tri)
            return new_t, new_tri

        return jax.lax.cond(jnp.any(need), test, lambda _: (best_t, best_tri), None)

    best_t, best_tri = jax.lax.fori_loop(
        0,
        num_clusters,
        body,
        (tmax, jnp.full((tmax.shape[0],), -1, jnp.int32)),
    )
    t_out_ref[0, 0, :] = best_t
    tri_out_ref[0, 0, :] = best_tri


def _any_kernel(
    o_ref, d_ref, tmax_ref, aabb_min_ref, aabb_max_ref, table_ref,
    occ_out_ref, entry_scratch,
):
    num_clusters = table_ref.shape[0]

    ox, oy, oz = o_ref[0, 0, :], o_ref[0, 1, :], o_ref[0, 2, :]
    dx, dy, dz = d_ref[0, 0, :], d_ref[0, 1, :], d_ref[0, 2, :]
    tmax = tmax_ref[0, 0, :]
    ix = jnp.float32(1.0) / dx
    iy = jnp.float32(1.0) / dy
    iz = jnp.float32(1.0) / dz

    entry_scratch[:, :] = _slab_entry_rows(
        aabb_min_ref, aabb_max_ref, ox, oy, oz, ix, iy, iz, tmax
    )

    # The carry is int32, not bool: Mosaic cannot legalize i1-vector loop
    # carries (scf.for legalization failure).
    def body(c, occluded):
        e = entry_scratch[c, :]
        need = jnp.isfinite(e) & (occluded == 0)

        def test(_):
            v = table_ref[c]
            t_cand, _ = _mt_block(v, ox, oy, oz, dx, dy, dz, tmax)
            return jnp.where(need & jnp.isfinite(t_cand), jnp.int32(1), occluded)

        return jax.lax.cond(jnp.any(need), test, lambda _: occluded, None)

    occluded = jax.lax.fori_loop(
        0, num_clusters, body, jnp.zeros((tmax.shape[0],), jnp.int32)
    )
    occ_out_ref[0, 0, :] = occluded


def _prep_rays(origin, direction, t_max):
    """Pad to a TILE multiple and lay out as (tiles, 3, TILE) SoA."""
    num_rays = origin.shape[0]
    padded = -(-num_rays // TILE) * TILE
    pad = padded - num_rays
    if pad:
        origin = jnp.concatenate([origin, jnp.full((pad, 3), 1e30, jnp.float32)])
        direction = jnp.concatenate(
            [direction, jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32), (pad, 1))]
        )
        t_max = jnp.concatenate([t_max, jnp.full((pad,), 1.0, jnp.float32)])
    tiles = padded // TILE
    o = origin.reshape(tiles, TILE, 3).transpose(0, 2, 1)
    d = direction.reshape(tiles, TILE, 3).transpose(0, 2, 1)
    tm = t_max.reshape(tiles, 1, TILE)
    return o, d, tm, tiles, num_rays


def _scene_tables(scene):
    """Cluster table as (C, 9, L) + AABB planes as (3, C)."""
    table = scene.cluster_tris.reshape(
        scene.cluster_tris.shape[0], scene.cluster_tris.shape[1], 9
    ).transpose(0, 2, 1)
    aabb_min = scene.cluster_min.T
    aabb_max = scene.cluster_max.T
    return table, aabb_min, aabb_max


def _interpret() -> bool:
    """Run kernels in interpreter mode off-TPU (CPU tests)."""
    return jax.default_backend() != "tpu"


@jax.jit
def pallas_intersect_closest(scene, origin, direction, t_max):
    """Closest-hit sweep. Returns (hit, t, tri_idx) — tri in real indices."""
    num_rays = origin.shape[0]
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (num_rays,))
    o, d, tm, tiles, n = _prep_rays(origin, direction, t_max)
    table, aabb_min, aabb_max = _scene_tables(scene)
    num_clusters = table.shape[0]

    t_out, tri_out = pl.pallas_call(
        _closest_kernel,
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((1, 3, TILE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, TILE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TILE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(aabb_min.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(aabb_max.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(table.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, TILE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TILE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((tiles, 1, TILE), jnp.float32),
            jax.ShapeDtypeStruct((tiles, 1, TILE), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((num_clusters, TILE), jnp.float32)],
        interpret=_interpret(),
    )(o, d, tm, aabb_min, aabb_max, table)

    t = t_out.reshape(-1)[:n]
    tri_padded = tri_out.reshape(-1)[:n]
    hit = tri_padded >= 0
    tri = jnp.where(hit, scene.cluster_tri_map[jnp.maximum(tri_padded, 0)], -1)
    return hit, jnp.where(hit, t, t_max[:n]), tri


@jax.jit
def pallas_intersect_any(scene, origin, direction, t_max):
    """Any-hit sweep. Returns occluded (B,) bool."""
    num_rays = origin.shape[0]
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (num_rays,))
    o, d, tm, tiles, n = _prep_rays(origin, direction, t_max)
    table, aabb_min, aabb_max = _scene_tables(scene)
    num_clusters = table.shape[0]

    occ = pl.pallas_call(
        _any_kernel,
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((1, 3, TILE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, TILE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TILE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(aabb_min.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(aabb_max.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(table.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, TILE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((tiles, 1, TILE), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((num_clusters, TILE), jnp.float32)],
        interpret=_interpret(),
    )(o, d, tm, aabb_min, aabb_max, table)[0]

    return occ.reshape(-1)[:n] > 0

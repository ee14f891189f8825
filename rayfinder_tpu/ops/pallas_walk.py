"""Pallas TPU kernels for two-level cluster-sweep ray traversal.

The XLA wavefront walk (render/wavefront.py) is HBM-bound: every walk step
gathers (chunk, L, 3, 3) triangle blocks out to HBM and reads them back. These
kernels reorganize traversal around the TPU's strengths:

* triangles are grouped into clusters of L consecutive leaf-ordered
  triangles, and clusters into super-clusters of SUPER consecutive clusters
  (both spatially coherent: the SAH builder's depth-first leaf order is a
  space-filling walk);
* the Pallas grid is **(ray tiles, super-clusters)** with supers innermost:
  each step streams ONE super's (SUPER, 9, L) triangle slice through VMEM
  (147 KB double-buffered — scales to millions of triangles where a fully
  VMEM-resident table would not), while the per-tile outputs (best t / tri,
  occlusion) live in VMEM across the super sweep as accumulation state;
* at each step the tile tests the super's entry distance against its current
  best hits and skips all work when no lane needs it (`pl.when`) — the
  block-uniform analog of BVH pruning. Surviving clusters run dense
  (TILE, L) Möller-Trumbore with numerics identical to render/intersect.py
  (EPSILON 1e-5, reference: src/pt/reference_path_tracer.wgsl:477-521).

Mosaic constraints shape the code: leading-dimension dynamic indexing only,
int32 loop carries (i1 vectors fail scf.for legalization), and numpy (not
jnp) module constants so nothing is captured as a traced value. Correctness
is pinned against the XLA walk in tests/test_pallas_walk.py.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPSILON = np.float32(1e-5)  # numpy: a jnp scalar would be captured as a constant
# Tunables (env-overridable for config scans; defaults are the tuned values).
SUPER = int(os.environ.get("RAYFINDER_SUPER", "64"))  # clusters per super-cluster
TILE = int(os.environ.get("RAYFINDER_TILE", "512"))  # rays per tile (32x16 pixels)
# Ray tiles processed per grid step: amortizes the ~4us fixed cost of a
# Mosaic grid step (measured on v5e: a no-op kernel at 469 steps costs ~2ms).
RT = int(os.environ.get("RAYFINDER_RT", "8"))
_FAR = np.float32(1e30)  # padded-cluster AABB plane: slab test always misses


def _slab_entry_rows(mins, maxs, ox, oy, oz, ix, iy, iz, tmax):
    """(rows, TILE) entry distances; +inf where the slab test fails.

    mins/maxs: (3, rows). Mirrors render/wavefront._slab_entry (and
    ray_intersection.cpp:101-136) exactly, including NaN comparison semantics
    for axis-parallel rays.
    """

    def axis_ts(lo, hi, o, inv):
        neg = inv < 0.0
        near_b = jnp.where(neg[None, :], hi[:, None], lo[:, None])
        far_b = jnp.where(neg[None, :], lo[:, None], hi[:, None])
        t0 = (near_b - o[None, :]) * inv[None, :]
        t1 = (far_b - o[None, :]) * inv[None, :]
        return t0, t1

    t0x, t1x = axis_ts(mins[0, :], maxs[0, :], ox, ix)
    t0y, t1y = axis_ts(mins[1, :], maxs[1, :], oy, iy)
    t0z, t1z = axis_ts(mins[2, :], maxs[2, :], oz, iz)

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
    hx = dyc * e2z - dzc * e2y
    hy = dzc * e2x - dxc * e2z
    hz = dxc * e2y - dyc * e2x
    det = e1x * hx + e1y * hy + e1z * hz
    inv_det = jnp.float32(1.0) / det

    sx = ox[:, None] - v0x
    sy = oy[:, None] - v0y
    sz = oz[:, None] - v0z
    u = inv_det * (sx * hx + sy * hy + sz * hz)
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


def _ray_regs(o_ref, d_ref, tmax_ref, rt: int):
    ox, oy, oz = o_ref[rt, 0, :], o_ref[rt, 1, :], o_ref[rt, 2, :]
    dx, dy, dz = d_ref[rt, 0, :], d_ref[rt, 1, :], d_ref[rt, 2, :]
    tmax = tmax_ref[rt, 0, :]
    inv = (jnp.float32(1.0) / dx, jnp.float32(1.0) / dy, jnp.float32(1.0) / dz)
    return (ox, oy, oz), (dx, dy, dz), inv, tmax


def _next_cluster(entry, bt):
    """Front-to-back cluster selection over a (SUPER, TILE) entry table.

    Returns (j, key): the untested cluster whose nearest needing lane is
    closest (the block-uniform analog of the reference's near-child-first
    stack order, ray_intersection.cpp:170-189), and that nearest distance.
    key == +inf means no cluster has any lane with entry < best_t — the
    whole-tile early-exit condition.
    """
    masked = jnp.where(entry < bt[None, :], entry, jnp.inf)
    key = jnp.min(masked, axis=1, keepdims=True)  # (SUPER, 1)
    j = jnp.argmin(key, axis=0)[0].astype(jnp.int32)
    return j, jnp.min(key)


def _make_closest_kernel(leaf: int):
    def kernel(
        o_ref, d_ref, tmax_ref, super_min_ref, super_max_ref,
        cl_min_ref, cl_max_ref, table_ref,
        t_out_ref, tri_out_ref, super_entry, cl_entry,
    ):
        s = pl.program_id(1)

        # Statically unrolled loop over the RT ray tiles in this grid step.
        for rt in range(RT):
            (ox, oy, oz), (dx, dy, dz), (ix, iy, iz), tmax = _ray_regs(
                o_ref, d_ref, tmax_ref, rt
            )

            # First super of a tile: compute all super entries, init outputs.
            @pl.when(s == 0)
            def _(rt=rt, ox=ox, oy=oy, oz=oz, ix=ix, iy=iy, iz=iz, tmax=tmax):
                super_entry[rt] = _slab_entry_rows(
                    super_min_ref[:, :], super_max_ref[:, :],
                    ox, oy, oz, ix, iy, iz, tmax,
                )
                t_out_ref[rt, 0, :] = tmax
                tri_out_ref[rt, 0, :] = jnp.full((tmax.shape[0],), -1, jnp.int32)

            best_t = t_out_ref[rt, 0, :]
            se = super_entry[rt, s, :]

            @pl.when(jnp.any(se < best_t))
            def _(
                rt=rt, best_t=best_t,
                ox=ox, oy=oy, oz=oz, dx=dx, dy=dy, dz=dz,
                ix=ix, iy=iy, iz=iz, tmax=tmax,
            ):
                cl_entry[:, :] = _slab_entry_rows(
                    cl_min_ref[0], cl_max_ref[0], ox, oy, oz, ix, iy, iz, tmax
                )

                # Front-to-back sweep with tile-wide early exit: test the
                # nearest needed cluster, shrink best_t, re-select. Ordering
                # cannot change the min-t result (only exact-tie winners); it
                # makes later clusters fail the `entry < best_t` test so the
                # loop ends after the few clusters that actually bound the
                # tile's hits.
                j0, k0 = _next_cluster(cl_entry[:, :], best_t)

                def cond(carry):
                    return jnp.isfinite(carry[3])

                def body(carry):
                    bt, btri, j, _ = carry
                    need = cl_entry[j, :] < bt
                    v = table_ref[0, j]  # (9, L)
                    t_cand, slot = _mt_block(v, ox, oy, oz, dx, dy, dz, bt)
                    better = need & (t_cand < bt)
                    tri = (s * SUPER + j) * leaf + slot
                    bt = jnp.where(better, t_cand, bt)
                    btri = jnp.where(better, tri, btri)
                    cl_entry[j, :] = jnp.full((bt.shape[0],), jnp.inf, jnp.float32)
                    j_next, key = _next_cluster(cl_entry[:, :], bt)
                    return bt, btri, j_next, key

                new_t, new_tri, _, _ = jax.lax.while_loop(
                    cond, body, (best_t, tri_out_ref[rt, 0, :], j0, k0)
                )
                t_out_ref[rt, 0, :] = new_t
                tri_out_ref[rt, 0, :] = new_tri

    return kernel


def _make_any_kernel(leaf: int):
    def kernel(
        o_ref, d_ref, tmax_ref, super_min_ref, super_max_ref,
        cl_min_ref, cl_max_ref, table_ref,
        occ_out_ref, super_entry, cl_entry,
    ):
        s = pl.program_id(1)

        for rt in range(RT):
            (ox, oy, oz), (dx, dy, dz), (ix, iy, iz), tmax = _ray_regs(
                o_ref, d_ref, tmax_ref, rt
            )

            @pl.when(s == 0)
            def _(rt=rt, ox=ox, oy=oy, oz=oz, ix=ix, iy=iy, iz=iz, tmax=tmax):
                super_entry[rt] = _slab_entry_rows(
                    super_min_ref[:, :], super_max_ref[:, :],
                    ox, oy, oz, ix, iy, iz, tmax,
                )
                occ_out_ref[rt, 0, :] = jnp.zeros((tmax.shape[0],), jnp.int32)

            occluded = occ_out_ref[rt, 0, :]
            se = super_entry[rt, s, :]
            active = jnp.isfinite(se) & (occluded == 0)

            @pl.when(jnp.any(active))
            def _(
                rt=rt, occluded=occluded,
                ox=ox, oy=oy, oz=oz, dx=dx, dy=dy, dz=dz,
                ix=ix, iy=iy, iz=iz, tmax=tmax,
            ):
                cl_entry[:, :] = _slab_entry_rows(
                    cl_min_ref[0], cl_max_ref[0], ox, oy, oz, ix, iy, iz, tmax
                )

                # Early-exit sweep: keep testing the nearest cluster any
                # unoccluded lane still overlaps; once every lane is occluded
                # (or nothing overlaps) the selection key goes +inf and the
                # loop ends. int32 occlusion carry: Mosaic cannot legalize
                # i1-vector carries.
                def pending_bound(occ):
                    # Unoccluded lanes keep their tmax bound; occluded lanes
                    # drop out by bounding at -inf (no entry can be < -inf).
                    return jnp.where(occ == 0, tmax, -jnp.inf)

                j0, k0 = _next_cluster(cl_entry[:, :], pending_bound(occluded))

                def cond(carry):
                    return jnp.isfinite(carry[2])

                def body(carry):
                    occ, j, _ = carry
                    need = jnp.isfinite(cl_entry[j, :]) & (occ == 0)
                    v = table_ref[0, j]
                    t_cand, _ = _mt_block(v, ox, oy, oz, dx, dy, dz, tmax)
                    occ = jnp.where(need & jnp.isfinite(t_cand), jnp.int32(1), occ)
                    cl_entry[j, :] = jnp.full((occ.shape[0],), jnp.inf, jnp.float32)
                    j_next, key = _next_cluster(cl_entry[:, :], pending_bound(occ))
                    return occ, j_next, key

                occ_fin, _, _ = jax.lax.while_loop(cond, body, (occluded, j0, k0))
                occ_out_ref[rt, 0, :] = occ_fin

    return kernel


def _prep_rays(origin, direction, t_max):
    """Pad to a TILE*RT multiple and lay out as (tiles, 3, TILE) SoA."""
    num_rays = origin.shape[0]
    padded = -(-num_rays // (TILE * RT)) * (TILE * RT)
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
    """Pad clusters to a SUPER multiple; emit the kernel layouts:
    table (S, SUPER, 9, L), super planes (3, S), cluster planes (S, 3, SUPER)."""
    num_clusters, leaf = scene.cluster_tris.shape[:2]
    num_supers = -(-num_clusters // SUPER)
    pad = num_supers * SUPER - num_clusters

    table = scene.cluster_tris.reshape(num_clusters, leaf, 9).transpose(0, 2, 1)
    cl_min = scene.cluster_min
    cl_max = scene.cluster_max
    if pad:
        table = jnp.concatenate([table, jnp.zeros((pad, 9, leaf), jnp.float32)], axis=0)
        # Far-away degenerate boxes: the slab test can never accept them.
        cl_min = jnp.concatenate([cl_min, jnp.full((pad, 3), _FAR)], axis=0)
        cl_max = jnp.concatenate([cl_max, jnp.full((pad, 3), _FAR)], axis=0)

    table = table.reshape(num_supers, SUPER, 9, leaf)
    groups_min = cl_min.reshape(num_supers, SUPER, 3)
    groups_max = cl_max.reshape(num_supers, SUPER, 3)
    super_min = jnp.min(groups_min, axis=1).T  # (3, S)
    super_max = jnp.max(groups_max, axis=1).T
    cl_min_rows = groups_min.transpose(0, 2, 1)  # (S, 3, SUPER)
    cl_max_rows = groups_max.transpose(0, 2, 1)
    return table, super_min, super_max, cl_min_rows, cl_max_rows


def _interpret() -> bool:
    """Run kernels in interpreter mode off-TPU (CPU tests)."""
    return jax.default_backend() != "tpu"


def _common_call(scene, origin, direction, t_max, kernel_factory, out_dtypes):
    leaf = scene.cluster_tris.shape[1]
    num_rays = origin.shape[0]
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (num_rays,))

    o, d, tm, tiles, n = _prep_rays(origin, direction, t_max)
    table, super_min, super_max, cl_min_rows, cl_max_rows = _scene_tables(scene)
    num_supers = table.shape[0]

    def full(shape):
        zeros = tuple(0 for _ in shape)
        return pl.BlockSpec(shape, lambda i, s, z=zeros: z, memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        kernel_factory(leaf),
        grid=(tiles // RT, num_supers),
        in_specs=[
            pl.BlockSpec((RT, 3, TILE), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RT, 3, TILE), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RT, 1, TILE), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM),
            full(super_min.shape),
            full(super_max.shape),
            pl.BlockSpec((1, 3, SUPER), lambda i, s: (s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, SUPER), lambda i, s: (s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, SUPER, 9, leaf), lambda i, s: (s, 0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec((RT, 1, TILE), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM)
            for _ in out_dtypes
        ],
        out_shape=[jax.ShapeDtypeStruct((tiles, 1, TILE), dt) for dt in out_dtypes],
        scratch_shapes=[
            pltpu.VMEM((RT, num_supers, TILE), jnp.float32),
            pltpu.VMEM((SUPER, TILE), jnp.float32),
        ],
        interpret=_interpret(),
    )(o, d, tm, super_min, super_max, cl_min_rows, cl_max_rows, table)
    return outs, n, t_max


@jax.jit
def pallas_intersect_closest(scene, origin, direction, t_max):
    """Closest-hit sweep. Returns (hit, t, tri_idx) — tri in real indices.

    Padding slots are degenerate triangles (bvh/clusters.py) that can never
    win, so the kernel's `cluster * leaf + slot` IS the real leaf-order
    triangle index — no remap gather (TPU gathers cost ~13ns/row; this one
    was ~2ms per pass at 800x600)."""
    (t_out, tri_out), n, t_max = _common_call(
        scene, origin, direction, t_max, _make_closest_kernel, (jnp.float32, jnp.int32)
    )
    t = t_out.reshape(-1)[:n]
    tri = tri_out.reshape(-1)[:n]
    hit = tri >= 0
    return hit, jnp.where(hit, t, t_max[:n]), tri


@jax.jit
def pallas_intersect_any(scene, origin, direction, t_max):
    """Any-hit sweep. Returns occluded (B,) bool."""
    (occ,), n, _ = _common_call(
        scene, origin, direction, t_max, _make_any_kernel, (jnp.int32,)
    )
    return occ.reshape(-1)[:n] > 0

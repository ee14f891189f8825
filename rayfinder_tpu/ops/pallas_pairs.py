"""Sorted (ray, cluster)-pair traversal: per-ray nearest-W cull kernel +
cluster-coherent visit kernel. The round-4 structural attack on big-scene
block-uniform divergence (VERDICT r3 Next #2).

The grouped tile sweeps (pallas_walk.py) pay the UNION of a 128-lane tile's
overlapped clusters: bounce tiles visit 16-19 of 24 supers and run ~20.8
cluster iterations while each ray needs ~1.7 (prof/diag_iters.py). The
reference's per-ray stack walk (src/common/ray_intersection.cpp:138-213)
only visits what each ray needs. This engine gets the TPU equivalent in
three dense stages (offline iteration counts: prof/study_pairsort.py —
primary 1.3 / bounce1 4.4 / bounce2 ~11 visit iterations per 128-lane tile
after sorting, vs ~38 for the grouped sweep; unsorted is REFUTED at 56-59):

1. **Cull kernel**: each ray slab-tests ALL cluster AABBs from a VMEM
   plane table (the dense XLA cull is HBM-doomed: 113 ms/pass at 262K rays
   x 2951 clusters, prof/prof_cm_phases.py) and keeps its W+1 nearest
   entries as packed int32 keys: entry f32 bits with the low 12 mantissa
   bits REPLACED by the cluster id. Packing rounds entries DOWN, which is
   the conservative direction for both selection activity and the
   done-proof below.
2. **Sort**: rays sort by (nearest, 2nd-nearest) cluster id — one argsort
   + one packed row gather (measured ~3.9 ms at 262K lanes, CLAUDE.md).
   Sorting makes tiles cluster-coherent; it is what turns per-ray lists
   into per-tile locality.
3. **Visit kernel**: per tile, repeatedly pick the globally nearest still-
   active (lane, slot) pair, DMA that ONE cluster's (16, L) triangle block,
   Möller-Trumbore it against all 128 lanes (extra lanes only tighten
   their bounds — accepts are always real intersections), and erase the id
   from every slot. Iterations = distinct needed clusters, not the tile
   union.

Exactness: a lane is PROVEN done iff its quantized (W+1)-th entry is not
below its best hit t — every untested cluster's true entry is >= that key's
entry, and a triangle hit is never nearer than its cluster's entry.
Unproven lanes re-walk compacted through pallas_intersect_closest (the
production exact sweep), so results are exact for every ray. Same
closest-hit contract as the reference's rayColor query
(src/pt/reference_path_tracer.wgsl:321-429).
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_walk import (
    EPSILON,
    _FAR,
    _full_spec,
    _interpret,
    _pick_tile,
    _prep_rays,
    _ray_regs,
    _slab_entry_rows,
    pallas_intersect_closest,
)

# Nearest clusters tested per ray before the exact tail. Offline
# (prof/study_pairsort.py): W=3 leaves 0.002% (primary) / 0.45% (bounce1) /
# 2% (bounce2) of rays unresolved.
PAIRS_W = int(os.environ.get("RAYFINDER_PAIRS_W", "3"))
_CID_BITS = 12  # cluster id bits packed into the key (C_pad <= 4096)
_CID_MASK = np.int32((1 << _CID_BITS) - 1)
_ENTRY_MASK = np.int32(~((1 << _CID_BITS) - 1))
_MISS_BASE = np.int32(0x7F000000)  # > any clamped finite entry's bits
_MAX_KEY = np.int32(0x7FFFFFFF)
_ENTRY_CLAMP = np.float32(1e30)  # keeps finite-entry bits below _MISS_BASE
_SUBCH = 64  # slab/pack sub-chunk rows (8 sublane registers)


def _pad_planes(scene):
    """Cluster AABB planes padded to a _SUBCH multiple: (3, C_pad) x2 + C."""
    cmin, cmax = scene.cluster_min, scene.cluster_max
    num_clusters = cmin.shape[0]
    c_pad = -(-num_clusters // _SUBCH) * _SUBCH
    if c_pad > (1 << _CID_BITS):
        raise ValueError(
            f"pairs traversal supports <= {1 << _CID_BITS} clusters, got {c_pad}")
    pad = c_pad - num_clusters
    if pad:
        cmin = jnp.concatenate([cmin, jnp.full((pad, 3), _FAR)], axis=0)
        cmax = jnp.concatenate([cmax, jnp.full((pad, 3), _FAR)], axis=0)
    return cmin.T, cmax.T, num_clusters, c_pad


_REDCH = 512  # rows per reduce/erase chunk (kept for prof/probe_cull.py)
# Ray tiles per cull grid step. MUST stay small: the r loop is
# python-unrolled (a fori_loop's dynamic leading-index stores cost
# ~0.15us each — 188/tile pushed the kernel from 17 to 45us/tile), and
# Mosaic software-pipelines the unrolled tiles: rt=4 spilled 38MB of
# scoped VMEM (16MB limit). rt=1 compiles and pays only the ~4us grid
# step on top of the ~17us tile.
_CULL_RT = int(os.environ.get("RAYFINDER_CULL_RT", "1"))


def _make_cull_kernel(c_pad: int, rt: int, w_plus1: int, tile: int):
    """Build + per-subchunk top-(w_plus1), WRITE-ONLY to the output ref.

    The shipped single-kernel cull read its own VMEM key-table writes back
    for the global top-4 extraction; Mosaic's vector scheduler serializes
    that same-ref read-after-write at ~28us/tile (prof/probe_cull.py:
    build+ex 42.4us vs build 7.0; a DMA copy does not dodge it, 41.2; a
    two-table pipeline doesn't either, 40.3/tile). Writing per-subchunk
    top-4 rows straight to the output (never read in-kernel) costs 17.4us
    and preserves exactness: the global top-4 is a subset of the union of
    per-64-row-subchunk top-4s; the XLA stage-2 reduce recovers it.
    """

    def kernel(o_ref, d_ref, tm_ref, mins_ref, maxs_ref, keys_out):
        # PYTHON-unrolled ray-tile loop: `r` must be STATIC — a fori_loop's
        # dynamic leading-index stores cost ~0.15us EACH (188/tile pushed
        # the in-context kernel to 45.4us/tile vs 17.4 probed with static
        # rows); rt stays small (grid amortization only needs ~4) so the
        # unrolled MLIR stays compilable.
        for r in range(rt):
            ox, oy, oz = o_ref[r, 0, :], o_ref[r, 1, :], o_ref[r, 2, :]
            dx, dy, dz = d_ref[r, 0, :], d_ref[r, 1, :], d_ref[r, 2, :]
            tmax = tm_ref[r, 0, :]
            ix = jnp.float32(1.0) / dx
            iy = jnp.float32(1.0) / dy
            iz = jnp.float32(1.0) / dz
            # Slab + pack one 64-row sub-chunk at a time (8 live sublane
            # registers; a fused full-table build+reduce spills
            # catastrophically: 171MB of register spill slots at rt=32),
            # reducing each to its w_plus1 nearest keys in registers.
            for a in range(0, c_pad, _SUBCH):
                e = _slab_entry_rows(
                    mins_ref[:, a:a + _SUBCH], maxs_ref[:, a:a + _SUBCH],
                    ox, oy, oz, ix, iy, iz, tmax)
                cid = jax.lax.broadcasted_iota(
                    jnp.int32, (_SUBCH, tile), 0) + jnp.int32(a)
                finite = e < _ENTRY_CLAMP  # inf = slab miss
                bits = jax.lax.bitcast_convert_type(
                    jnp.maximum(e, jnp.float32(0.0)), jnp.int32)
                key = jnp.where(finite, (bits & _ENTRY_MASK) | cid,
                                _MISS_BASE | cid)
                s = a // _SUBCH
                for k in range(w_plus1):
                    m = key.min(axis=0)
                    keys_out[r, s * w_plus1 + k, :] = m
                    if k + 1 < w_plus1:
                        key = jnp.where(key == m[None, :], _MAX_KEY, key)

    return kernel


def _cull_topw(scene, origin, direction, t_max, w_plus1: int):
    """(B, w_plus1) packed nearest-entry keys (ascending)."""
    minsT, maxsT, _, c_pad = _pad_planes(scene)
    nsub = c_pad // _SUBCH
    rows = nsub * w_plus1
    tile, _ = _pick_tile(scene.cluster_tris.shape[0])
    rt = _CULL_RT  # small static unroll (see _make_cull_kernel)
    o, d, tm, tiles, n = _prep_rays(origin, direction, t_max, tile, rt)
    sub = pl.pallas_call(
        _make_cull_kernel(c_pad, rt, w_plus1, tile),
        grid=(tiles // rt,),
        in_specs=[
            pl.BlockSpec((rt, 3, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, 3, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, 1, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            _full_spec(minsT.shape),
            _full_spec(maxsT.shape),
        ],
        out_specs=pl.BlockSpec(
            (rt, rows, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tiles, rows, tile), jnp.int32),
        interpret=_interpret(),
    )(o, d, tm, minsT, maxsT)
    # Stage 2 (XLA): global top-(w_plus1) from the per-subchunk top rows.
    # Keys are unique (cid in the low bits), so erase-by-equality is safe.
    # Reduce over the ROW axis in the kernel's (tiles, rows, tile) layout —
    # transposing the full table to row-major first is a ~200MB relayout
    # that cost ~15ms/pass; the final (tiles, w_plus1, tile) is tiny.
    cols = []
    for k in range(w_plus1):
        m = sub.min(axis=1)
        cols.append(m)
        if k + 1 < w_plus1:
            sub = jnp.where(sub == m[:, None, :], _MAX_KEY, sub)
    keys = jnp.stack(cols, axis=1)  # (tiles, w_plus1, tile)
    return keys.transpose(0, 2, 1).reshape(-1, w_plus1)[:n]


def _key_entry(key):
    """Packed key -> conservative (rounded-down) entry distance."""
    return jax.lax.bitcast_convert_type(key & _ENTRY_MASK, jnp.float32)


def _mt_cluster(buf, ox, oy, oz, dx, dy, dz, t_bound):
    """Möller-Trumbore of TILE rays vs the DMA'd (16, L) cluster block
    (rows 0-8 = v0x..v2z, same layout as pallas_walk._mt_block)."""
    v = [buf[r, :][None, :] for r in range(9)]
    v0x, v0y, v0z = v[0], v[1], v[2]
    e1x, e1y, e1z = v[3] - v0x, v[4] - v0y, v[5] - v0z
    e2x, e2y, e2z = v[6] - v0x, v[7] - v0y, v[8] - v0z

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
    return jnp.min(t_masked, axis=1), jnp.argmin(t_masked, axis=1).astype(jnp.int32)


def _mt_cluster_any(buf, ox, oy, oz, dx, dy, dz, t_bound):
    """Any-accept variant of _mt_cluster: per-ray bool over the L tris."""
    v = [buf[r, :][None, :] for r in range(9)]
    v0x, v0y, v0z = v[0], v[1], v[2]
    e1x, e1y, e1z = v[3] - v0x, v[4] - v0y, v[5] - v0z
    e2x, e2y, e2z = v[6] - v0x, v[7] - v0y, v[8] - v0z

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
    return jnp.any(ok, axis=1)


def _make_visit_any_kernel(leaf: int, rt: int, w: int, tile: int):
    """Occlusion visit loop: like the closest kernel, but a lane drops out
    (bound -> -inf, erasing all its pairs from selection) at its first
    accepted intersection; output is the occlusion mask."""
    def kernel(o_ref, d_ref, tm_ref, keys_ref, start_ref, table_hbm,
               occ_out, buf, sem):
        del start_ref
        for r in range(rt):
            (ox, oy, oz), (dx, dy, dz), _, tmax = _ray_regs(
                o_ref, d_ref, tm_ref, r)
            keys0 = [keys_ref[r, k, :] for k in range(w)]

            def active_min(keys, bt):
                ak = None
                for k in keys:
                    a = jnp.where(_key_entry(k) < bt, k, _MAX_KEY)
                    ak = a if ak is None else jnp.minimum(ak, a)
                return jnp.min(ak)

            def cond(st):
                return st[0] != _MAX_KEY

            def body(st):
                mkey, bt, occ = st[0], st[1], st[2]
                keys = list(st[3:])
                cid = mkey & _CID_MASK
                dma = pltpu.make_async_copy(table_hbm.at[cid], buf, sem)
                dma.start()
                keys = [
                    jnp.where((k & _CID_MASK) == cid, _MAX_KEY, k)
                    for k in keys
                ]
                dma.wait()
                hit = _mt_cluster_any(buf, ox, oy, oz, dx, dy, dz, bt)
                occ = occ | hit.astype(jnp.int32)
                bt = jnp.where(hit, jnp.float32(-jnp.inf), bt)
                return (active_min(keys, bt), bt, occ, *keys)

            occ0 = jnp.zeros((tile,), jnp.int32)
            st = jax.lax.while_loop(
                cond, body, (active_min(keys0, tmax), tmax, occ0, *keys0))
            occ_out[r, 0, :] = st[2]

    return kernel


@partial(jax.jit, static_argnames=("w",))
def pairs_intersect_any(scene, origin, direction, t_max, *, w: int = PAIRS_W):
    """Any-hit (occlusion) query via sorted pair traversal. Returns
    (occluded, tail_count). Exact: a lane is proven CLEAR iff its
    (W+1)-th quantized entry is not below t_max (every untested cluster
    enters later than the query range); unresolved lanes re-check through
    the production any-hit sweep."""
    from .pallas_walk import pallas_intersect_any

    num_rays = origin.shape[0]
    num_clusters, leaf = scene.cluster_tris.shape[:2]
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (num_rays,))

    keys = _cull_topw(scene, origin, direction, t_max, w + 1)
    sort_key = (keys[:, 0] & _CID_MASK) * jnp.int32(1 << _CID_BITS) + (
        keys[:, 1] & _CID_MASK)
    perm = jnp.argsort(sort_key).astype(jnp.int32)
    # Ints ride their own gather: bitcasting key/tri ints through f32 hits
    # denormal flush-to-zero in the 262K-row scatter/gather lowering
    # (values < 2^23 silently become 0; scale/layout dependent). XLA fuses
    # same-index gathers, so the split costs nothing (CLAUDE.md session 4).
    packed = jnp.concatenate(
        [origin, direction, t_max[:, None]], axis=1)[perm]
    keys_s = keys[perm]
    o_s, d_s, tm_s = packed[:, 0:3], packed[:, 3:6], packed[:, 6]

    tile, rt = _pick_tile(num_clusters)
    o_p, d_p, tm_p, tiles, n = _prep_rays(o_s, d_s, tm_s, tile, rt)
    pad = tiles * tile - keys_s.shape[0]
    kw_s = keys_s[:, :w]
    if pad:
        kw_s = jnp.concatenate(
            [kw_s, jnp.full((pad, w), _MAX_KEY, jnp.int32)], axis=0)
    kw_s = kw_s.reshape(tiles, tile, w).transpose(0, 2, 1)
    table = jnp.concatenate(
        [
            scene.cluster_tris.reshape(num_clusters, leaf, 9).transpose(0, 2, 1),
            jnp.zeros((num_clusters, 7, leaf), jnp.float32),
        ],
        axis=1,
    )
    (occ_out,) = pl.pallas_call(
        _make_visit_any_kernel(leaf, rt, w, tile),
        grid=(tiles // rt,),
        in_specs=[
            pl.BlockSpec((rt, 3, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, 3, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, 1, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, w, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((rt, 1, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((tiles, 1, tile), jnp.int32)],
        scratch_shapes=[
            pltpu.VMEM((16, leaf), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=_interpret(),
    )(o_p, d_p, tm_p, kw_s, scene.cluster_start, table)
    occ_s = occ_out.reshape(-1)[:n] > 0

    unres_s = ~occ_s & (_key_entry(keys_s[:, w]) < tm_s)
    back = jnp.stack(
        [occ_s.astype(jnp.float32), unres_s.astype(jnp.float32)], axis=1)
    out = jnp.zeros((num_rays, 2), jnp.float32).at[perm].set(back)
    occluded = out[:, 0] > 0.0
    unresolved = out[:, 1] > 0.0
    tail_count = jnp.sum(unresolved.astype(jnp.int32))

    chunk = _tail_chunk(num_rays)

    def cond(st):
        return jnp.any(st[0])

    def body(st):
        unresolved, occluded = st
        idx = jnp.nonzero(unresolved, size=chunk, fill_value=num_rays)[0]
        idx = idx.astype(jnp.int32)
        valid = idx < num_rays
        safe = jnp.minimum(idx, num_rays - 1)
        occ2 = pallas_intersect_any(
            scene, origin[safe], direction[safe], t_max[safe])
        occluded = occluded.at[idx].set(
            jnp.where(valid, occ2 | occluded[safe], occluded[safe]),
            mode="drop")
        unresolved = unresolved.at[idx].set(False, mode="drop")
        return unresolved, occluded

    _, occluded = jax.lax.while_loop(cond, body, (unresolved, occluded))
    return occluded, tail_count


def _make_visit_kernel(leaf: int, rt: int, w: int, tile: int):
    def kernel(o_ref, d_ref, tm_ref, keys_ref, start_ref, table_hbm,
               t_out, tri_out, buf, sem):
        for r in range(rt):
            (ox, oy, oz), (dx, dy, dz), _, tmax = _ray_regs(
                o_ref, d_ref, tm_ref, r)
            keys0 = [keys_ref[r, k, :] for k in range(w)]

            def active_min(keys, bt):
                ak = None
                for k in keys:
                    a = jnp.where(_key_entry(k) < bt, k, _MAX_KEY)
                    ak = a if ak is None else jnp.minimum(ak, a)
                return jnp.min(ak)

            def cond(st):
                return st[0] != _MAX_KEY

            def body(st):
                mkey, bt, btri = st[0], st[1], st[2]
                keys = list(st[3:])
                cid = mkey & _CID_MASK
                dma = pltpu.make_async_copy(table_hbm.at[cid], buf, sem)
                dma.start()
                # Erase the visited id from every slot while the DMA flies.
                keys = [
                    jnp.where((k & _CID_MASK) == cid, _MAX_KEY, k)
                    for k in keys
                ]
                dma.wait()
                t, slot = _mt_cluster(buf, ox, oy, oz, dx, dy, dz, bt)
                better = t < bt
                bt = jnp.where(better, t, bt)
                # Clusters are variable-length leaf ranges: real triangle =
                # cluster start + slot (padding slots are degenerate
                # triangles and never win).
                btri = jnp.where(better, start_ref[cid] + slot, btri)
                return (active_min(keys, bt), bt, btri, *keys)

            bt0 = tmax
            btri0 = jnp.full((tile,), -1, jnp.int32)
            st = jax.lax.while_loop(
                cond, body, (active_min(keys0, bt0), bt0, btri0, *keys0))
            t_out[r, 0, :] = st[1]
            tri_out[r, 0, :] = st[2]

    return kernel


def _visit(scene, origin, direction, t_max, keys, w: int):
    """Run the visit kernel over sorted rays. keys: (B, >=w) packed."""
    num_clusters, leaf = scene.cluster_tris.shape[:2]
    tile, rt = _pick_tile(num_clusters)
    o, d, tm, tiles, n = _prep_rays(origin, direction, t_max, tile, rt)
    pad = tiles * tile - keys.shape[0]
    kw = keys[:, :w]
    if pad:
        kw = jnp.concatenate(
            [kw, jnp.full((pad, w), _MAX_KEY, jnp.int32)], axis=0)
    kw = kw.reshape(tiles, tile, w).transpose(0, 2, 1)
    # (C, 16, L) DMA blocks: 9 vertex rows + sublane-alignment padding (a
    # (9, L) minor-dim slice faults the TPU worker; 16 is the aligned tile).
    table = jnp.concatenate(
        [
            scene.cluster_tris.reshape(num_clusters, leaf, 9).transpose(0, 2, 1),
            jnp.zeros((num_clusters, 7, leaf), jnp.float32),
        ],
        axis=1,
    )
    t_out, tri_out = pl.pallas_call(
        _make_visit_kernel(leaf, rt, w, tile),
        grid=(tiles // rt,),
        in_specs=[
            pl.BlockSpec((rt, 3, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, 3, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, 1, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, w, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((rt, 1, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
            for _ in range(2)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((tiles, 1, tile), jnp.float32),
            jax.ShapeDtypeStruct((tiles, 1, tile), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((16, leaf), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=_interpret(),
    )(o, d, tm, kw, scene.cluster_start, table)
    return t_out.reshape(-1)[:n], tri_out.reshape(-1)[:n]


def _tail_chunk(num_rays: int) -> int:
    """Static tail sub-batch: measured unresolved fractions are 0.002%
    (primary) / 0.5% (bounce1) / 2% (bounce2), so a small chunk almost
    always drains in one pass — and a whole production-sweep pass at 32K
    rays costs ~8 ms, which a 7-ray tail must not pay."""
    return min(num_rays, 4096)


def _tail_resolve(scene, origin, direction, t_max, unresolved, t, tri):
    """Re-walk unresolved rays (compacted chunks) through the exact
    production sweep; loops until none remain. Zero iterations when clean."""
    num_rays = origin.shape[0]
    chunk = _tail_chunk(num_rays)

    def cond(st):
        return jnp.any(st[0])

    def body(st):
        unresolved, t, tri = st
        idx = jnp.nonzero(unresolved, size=chunk, fill_value=num_rays)[0]
        idx = idx.astype(jnp.int32)
        valid = idx < num_rays
        safe = jnp.minimum(idx, num_rays - 1)
        o, d = origin[safe], direction[safe]
        h2, t2, tri2 = pallas_intersect_closest(scene, o, d, t_max[safe])
        better = valid & h2 & (t2 < t[safe])
        t = t.at[idx].set(jnp.where(better, t2, t[safe]), mode="drop")
        tri = tri.at[idx].set(jnp.where(better, tri2, tri[safe]), mode="drop")
        unresolved = unresolved.at[idx].set(False, mode="drop")
        return unresolved, t, tri

    _, t, tri = jax.lax.while_loop(cond, body, (unresolved, t, tri))
    return t, tri


@partial(jax.jit, static_argnames=("w",))
def pairs_intersect_closest(scene, origin, direction, t_max, *, w: int = PAIRS_W):
    """Closest-hit query via sorted pair traversal. Returns (hit, t, tri,
    tail_count); exact for every ray (see module docstring)."""
    num_rays = origin.shape[0]
    leaf = scene.cluster_tris.shape[1]
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (num_rays,))

    keys = _cull_topw(scene, origin, direction, t_max, w + 1)

    # Sort rays by (nearest, 2nd-nearest) cluster id. Rays ride one packed
    # f32 gather; keys ride their own int gather (same indices — XLA fuses
    # them; bitcasting ints through f32 flushes denormals at this scale).
    sort_key = (keys[:, 0] & _CID_MASK) * jnp.int32(1 << _CID_BITS) + (
        keys[:, 1] & _CID_MASK)
    perm = jnp.argsort(sort_key).astype(jnp.int32)
    packed = jnp.concatenate(
        [origin, direction, t_max[:, None]], axis=1)[perm]
    keys_s = keys[perm]
    o_s = packed[:, 0:3]
    d_s = packed[:, 3:6]
    tm_s = packed[:, 6]

    t_s, tri_s = _visit(scene, o_s, d_s, tm_s, keys_s, w)

    # Done-proof: unresolved iff the (W+1)-th (quantized-down) entry is
    # still below the best hit distance.
    unres_s = _key_entry(keys_s[:, w]) < t_s

    # Un-permute: f32 scatter for (t, unres), int scatter for tri.
    back = jnp.concatenate(
        [t_s[:, None], unres_s[:, None].astype(jnp.float32)], axis=1)
    out = jnp.zeros((num_rays, 2), jnp.float32).at[perm].set(back)
    tri = jnp.full((num_rays,), -1, jnp.int32).at[perm].set(tri_s)
    t = out[:, 0]
    unresolved = out[:, 1] > 0.0

    tail_count = jnp.sum(unresolved.astype(jnp.int32))
    t, tri = _tail_resolve(scene, origin, direction, t_max, unresolved, t, tri)
    hit = tri >= 0
    return hit, jnp.where(hit, t, t_max), tri, tail_count

"""Cheap per-ray nearest-cluster sort keys for the fused regen loop.

prof/study_courtsort.py (dumped courtyard sets, production cost models):
sorting lanes by their nearest-cluster id instead of the previous hit tri
collapses the grouped sweep's per-tile costs ~9x (bounce1 tile-select
iterations 56.5 -> 6.2, super visits 18.7 -> 2.2). The full pair-cull
kernel that computes exact nearest-W keys costs ~17-45us/tile (it slab
tests ALL C clusters per lane) — far too much to spend on a sort key.

This kernel gets an approximate nearest-(c0, c1) in ~1-2us/tile:
  1. slab-test the G=128-cluster GROUP boxes (<= 128 groups ride sublane
     chunks of one _slab_entry_rows call) and pick each lane's nearest
     entered group;
  2. lane-shuffle that group's cluster planes out of a (6*G, S) VMEM table
     (jnp.take_along_axis along lanes — exact, session-4 pattern) and scan
     its 128 clusters in (8, 128) register chunks, keeping a running top-2
     of packed (entry | cid) keys.

The keys only order lanes (the traversal stays exact regardless), so
restricting candidates to the nearest group is a sound approximation: the
nearest cluster lives in the nearest-entered group for almost all rays,
and study_courtsort shows slot-0 alone captures ~90% of the win.

Reference analog: the per-ray BVH descent order of
/root/reference/src/common/ray_intersection.cpp:138-213 — here reduced to
a 2-level key because the TPU needs lockstep tiles, not per-ray stacks.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_walk import _FAR, _full_spec, _interpret, _prep_rays, _slab_entry_rows

_G = 128          # clusters per group (one lane-shuffle register width)
_CID_BITS = 14    # group*128+slot ids: supports C <= 16384
_CID_MASK = np.int32((1 << _CID_BITS) - 1)
_ENTRY_MASK = np.int32(~((1 << _CID_BITS) - 1))
_MISS = np.int32(0x7F000000 | ((1 << _CID_BITS) - 1))
_MAX_KEY = np.int32(0x7FFFFFFF)
_ENTRY_CLAMP = np.float32(1e30)
_KEY_RT = 8


def keycull_tables(scene):
    """Loop-invariant tables: group boxes (3, SP) x2 with groups on lanes
    (SP = groups padded to a 64 sublane chunk) and the cluster-plane table
    (6*_G, 128) with rows = plane*_G + slot, lanes = group id."""
    cmin, cmax = scene.cluster_min, scene.cluster_max
    num_clusters = cmin.shape[0]
    s = -(-num_clusters // _G)
    if s > 128:
        raise ValueError(f"keycull supports <= {128 * _G} clusters")
    pad = s * _G - num_clusters
    if pad:
        cmin = jnp.concatenate([cmin, jnp.full((pad, 3), _FAR)], axis=0)
        cmax = jnp.concatenate([cmax, jnp.full((pad, 3), _FAR)], axis=0)
    cmin3 = cmin.reshape(s, _G, 3)
    cmax3 = cmax.reshape(s, _G, 3)
    # Group unions EXCLUDE the _FAR pad point-boxes (the session-11 pad-box
    # lesson: a plain max over them blows every padded union to 1e30).
    real = (jnp.arange(s * _G) < num_clusters).reshape(s, _G, 1)
    gmin = jnp.min(jnp.where(real, cmin3, jnp.float32(_FAR)), axis=1)
    gmax = jnp.max(jnp.where(real, cmax3, jnp.float32(-_FAR)), axis=1)
    empty = ~real.any(axis=1)
    gmax = jnp.where(empty, jnp.float32(_FAR), gmax)  # keep min <= max
    sp = -(-s // 64) * 64
    gp = sp - s
    if gp:
        gmin = jnp.concatenate([gmin, jnp.full((gp, 3), _FAR)], axis=0)
        gmax = jnp.concatenate([gmax, jnp.full((gp, 3), _FAR)], axis=0)
    # (6*_G, 128): row p*_G + j = plane p of slot j, lane = group id
    planes = jnp.concatenate([cmin3, cmax3], axis=2)      # (s, _G, 6)
    ctab = planes.transpose(2, 1, 0).reshape(6 * _G, s)   # (6*_G, s)
    lp = 128 - s
    if lp:
        ctab = jnp.concatenate(
            [ctab, jnp.full((6 * _G, lp), _FAR)], axis=1)
    return gmin.T, gmax.T, ctab, s


def _make_key_kernel(sp: int, rt: int, tile: int):
    def kernel(o_ref, d_ref, gmin_ref, gmax_ref, ctab_ref, keys_out):
        def tile_body(r, carry):
            ox, oy, oz = o_ref[r, 0, :], o_ref[r, 1, :], o_ref[r, 2, :]
            dx, dy, dz = d_ref[r, 0, :], d_ref[r, 1, :], d_ref[r, 2, :]
            ix = jnp.float32(1.0) / dx
            iy = jnp.float32(1.0) / dy
            iz = jnp.float32(1.0) / dz
            tmax = jnp.full((tile,), 1e4, jnp.float32)

            # Nearest entered group per lane (groups ride sublanes).
            gbest = None
            for a in range(0, sp, 64):
                e = _slab_entry_rows(
                    gmin_ref[:, a:a + 64], gmax_ref[:, a:a + 64],
                    ox, oy, oz, ix, iy, iz, tmax)
                gid = jax.lax.broadcasted_iota(jnp.int32, (64, tile), 0) + a
                finite = e < _ENTRY_CLAMP
                bits = jax.lax.bitcast_convert_type(
                    jnp.maximum(e, jnp.float32(0.0)), jnp.int32)
                gk = jnp.where(finite, (bits & _ENTRY_MASK) | gid,
                               _MAX_KEY)
                m = gk.min(axis=0)
                gbest = m if gbest is None else jnp.minimum(gbest, m)
            sstar = (gbest & _CID_MASK)[None, :]          # (1, tile)
            smiss = gbest == _MAX_KEY
            sidx = jnp.where(smiss[None, :], 0, sstar)

            # Scan the selected group's 128 clusters in (8, tile) chunks.
            m0 = jnp.full((tile,), _MAX_KEY, jnp.int32)
            m1 = m0
            base_cid = sstar.astype(jnp.int32) * jnp.int32(_G)
            for c in range(0, _G, 8):
                pv = []
                for p in range(6):
                    blk = ctab_ref[p * _G + c:p * _G + c + 8, :]
                    pv.append(jnp.take_along_axis(
                        blk, jnp.broadcast_to(sidx, (8, tile)), axis=1))
                mnx, mny, mnz, mxx, mxy, mxz = pv
                t0x, t1x = (mnx - ox[None, :]) * ix, (mxx - ox[None, :]) * ix
                t0y, t1y = (mny - oy[None, :]) * iy, (mxy - oy[None, :]) * iy
                t0z, t1z = (mnz - oz[None, :]) * iz, (mxz - oz[None, :]) * iz
                lo = jnp.maximum(
                    jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                    jnp.minimum(t0z, t1z))
                hi = jnp.minimum(
                    jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                    jnp.maximum(t0z, t1z))
                e = jnp.where((lo <= hi) & (hi > 0.0) & (lo < tmax[None, :]),
                              jnp.maximum(lo, 0.0), jnp.float32(jnp.inf))
                cid = base_cid + jnp.int32(c) + jax.lax.broadcasted_iota(
                    jnp.int32, (8, tile), 0)
                finite = e < _ENTRY_CLAMP
                bits = jax.lax.bitcast_convert_type(e, jnp.int32)
                key = jnp.where(finite, (bits & _ENTRY_MASK) | cid, _MAX_KEY)
                # chunk top-2 (erase within registers), then running merge
                k0 = key.min(axis=0)
                k1 = jnp.where(key == k0[None, :], _MAX_KEY, key).min(axis=0)
                m1 = jnp.minimum(jnp.maximum(m0, k0), jnp.minimum(m1, k1))
                m0 = jnp.minimum(m0, k0)
            m0 = jnp.where(smiss, _MISS, m0)
            m1 = jnp.where(smiss, _MISS, m1)
            keys_out[r, 0, :] = m0
            keys_out[r, 1, :] = m1
            return carry

        jax.lax.fori_loop(0, rt, tile_body, jnp.int32(0))

    return kernel


def pallas_nearest2(tables, origin, direction):
    """Per-ray packed (entry | cid) keys of the ~2 nearest clusters within
    the nearest-entered group: (B, 2) int32 (MISS-keyed when no group is
    entered). Use sort_key_from_keys for the composite ordering key."""
    gminT, gmaxT, ctab, _s = tables
    num_rays = origin.shape[0]
    tile, rt = 128, _KEY_RT
    t_dummy = jnp.full((num_rays,), 1e4, jnp.float32)
    o, d, _tm, tiles, n = _prep_rays(origin, direction, t_dummy, tile, rt)
    sp = gminT.shape[1]
    keys = pl.pallas_call(
        _make_key_kernel(sp, rt, tile),
        grid=(tiles // rt,),
        in_specs=[
            pl.BlockSpec((rt, 3, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, 3, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            _full_spec(gminT.shape),
            _full_spec(gmaxT.shape),
            _full_spec(ctab.shape),
        ],
        out_specs=pl.BlockSpec(
            (rt, 2, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tiles, 2, tile), jnp.int32),
        interpret=_interpret(),
    )(o, d, gminT, gmaxT, ctab)
    return keys.transpose(0, 2, 1).reshape(-1, 2)[:n]


def sort_key_from_keys(keys):
    """(B, 2) packed keys -> (B,) int32 composite (c0, c1) ordering key;
    MISS lanes collapse to one tail group just below the dead-lane key."""
    c0 = keys[:, 0] & _CID_MASK
    c1 = keys[:, 1] & _CID_MASK
    k = c0 * jnp.int32(1 << _CID_BITS) + c1
    return jnp.where(keys[:, 0] == _MISS, jnp.int32(2**29), k)

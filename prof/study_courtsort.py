"""Offline study: what happens to the PRODUCTION grouped-sweep tile costs on
the courtyard if the regen loop sorts by the pair-cull key (nearest cluster
c0, then c1) instead of the previous hit tri?

prof/study_pairsort.py showed the pairs-kernel union-erase model needs 4.4
iters/tile (bounce1, c0c1-sorted) vs ~38 tri-sorted — but that's the pairs
visit model. This study runs the PRODUCTION cost models on the dumped ray
sets under each ordering:
  * tile-select iters — front-to-back per-TILE selection w/ early exit
    (distinct clusters tested until every lane's bound is proven);
  * lane-max — max over a tile's lanes of the per-lane needed-cluster count
    (the per-lane-selection sweep's lockstep iteration floor);
  * super visits — distinct SUPER_G-ranges among tested clusters (each is a
    590KB DMA + entry build in the grouped kernel).

Run: PYTHONPATH= JAX_PLATFORMS=cpu python -u prof/study_courtsort.py
"""
import os
import sys; sys.path.insert(0, "/root/repo")

import numpy as np

import jax
jax.config.update("jax_platforms", "cpu")

from rayfinder_tpu.render.scene import build_device_scene
from rayfinder_tpu.scene.procedural import courtyard_scene

TILE = 128
SUPER = 64  # production SUPER_G
SAMPLE_TILES = int(os.environ.get("TILES", "256"))

flat, textures = courtyard_scene(26)
scene = build_device_scene(flat, textures=textures)
C = scene.cluster_tris.shape[0]
L = scene.cluster_tris.shape[1]
cmin = np.asarray(scene.cluster_min)
cmax = np.asarray(scene.cluster_max)
tri_map = np.asarray(scene.cluster_tri_map)
print(f"clusters {C} leaf {L}")

tri_cluster = np.full(int(tri_map.max()) + 2, -1, np.int64)
valid = tri_map >= 0
tri_cluster[tri_map[valid]] = np.arange(C * L)[valid] // L

z = np.load("/tmp/court_rays.npz")


def entries(o, d):
    inv = 1.0 / d
    neg = inv < 0.0
    near = np.where(neg[:, None, :], cmax[None], cmin[None])
    far = np.where(neg[:, None, :], cmin[None], cmax[None])
    t0 = (near - o[:, None, :]) * inv[:, None, :]
    t1 = (far - o[:, None, :]) * inv[:, None, :]
    lo = np.max(t0, axis=-1)
    hi = np.min(t1, axis=-1)
    ok = (lo <= hi) & (lo < 1e4) & (hi > 0.0)
    return np.where(ok, np.maximum(lo, 0.0), np.inf).astype(np.float32)


def study(tag, key):
    o, d = z[f"{tag}_o"], z[f"{tag}_d"]
    hit, t, tri = z[f"{tag}_hit"], z[f"{tag}_t"], z[f"{tag}_tri"]
    true_t = np.where(hit, t, 1e4).astype(np.float32)
    hit_cid = np.where(hit, tri_cluster[np.maximum(tri, 0)], -1)
    N = len(o)

    if key == "none":
        order = np.arange(N)
    elif key == "approx":
        # Mimic ops/pallas_keycull: nearest entered GROUP of _G=128
        # consecutive clusters (pad-excluding union boxes), then top-2
        # clusters WITHIN that group by packed (entry | cid) key.
        G = 128
        s = -(-C // G)
        gmin = np.full((s, 3), np.inf, np.float32)
        gmax = np.full((s, 3), -np.inf, np.float32)
        for g in range(s):
            sl = slice(g * G, min((g + 1) * G, C))
            gmin[g] = cmin[sl].min(0)
            gmax[g] = cmax[sl].max(0)
        k2 = np.zeros((N,), np.int64)
        CID_BITS = 14
        for st_ in range(0, N, 8192):
            sl = slice(st_, min(st_ + 8192, N))
            oo, dd = o[sl], d[sl]
            inv = 1.0 / dd
            lo = (gmin[None] - oo[:, None]) * inv[:, None]
            hi = (gmax[None] - oo[:, None]) * inv[:, None]
            t0 = np.minimum(lo, hi).max(2)
            t1 = np.maximum(lo, hi).min(2)
            ok = (t0 <= t1) & (t1 > 0) & (t0 < 1e4)
            ge = np.where(ok, np.maximum(t0, 0.0), np.inf).astype(np.float32)
            gbits = ge.view(np.int32).astype(np.int64)
            gk = np.where(np.isfinite(ge),
                          (gbits & ~((1 << CID_BITS) - 1))
                          + np.arange(s)[None], np.int64(2**62))
            gstar = gk.min(1) & ((1 << CID_BITS) - 1)
            gmiss = ~np.isfinite(ge).any(1)
            e = entries(oo, dd)  # (n, C) exact cluster entries
            keyc = np.full((len(oo), C), 2**62, np.int64)
            bits = e.astype(np.float32).view(np.int32).astype(np.int64)
            fin = np.isfinite(e)
            allk = np.where(fin, (bits & ~((1 << CID_BITS) - 1))
                            + np.arange(C)[None], np.int64(2**62))
            for i in range(len(oo)):
                g = int(gstar[i])
                slc = slice(g * G, min((g + 1) * G, C))
                keyc[i, slc] = allk[i, slc]
            part = np.partition(keyc, 1, axis=1)[:, :2]
            c0 = part[:, 0] & ((1 << CID_BITS) - 1)
            c1 = part[:, 1] & ((1 << CID_BITS) - 1)
            c0 = np.where(part[:, 0] >= 2**62, C, c0)
            c1 = np.where(part[:, 1] >= 2**62, C, c1)
            kk = c0 * (C + 1) + c1
            k2[sl] = np.where(gmiss, (C + 1) * (C + 1), kk)
        order = np.argsort(k2, kind="stable")
    else:
        # nearest / 2nd-nearest cluster ids from chunked entry computation
        c01 = np.zeros((N, 2), np.int64)
        for s in range(0, N, 8192):
            sl = slice(s, min(s + 8192, N))
            e = entries(o[sl], d[sl])
            idx = np.argpartition(e, 1, axis=1)[:, :2]
            ee = np.take_along_axis(e, idx, 1)
            swap = ee[:, 0] > ee[:, 1]
            idx[swap] = idx[swap][:, ::-1]
            c01[sl] = idx
        k = c01[:, 0] * C + (c01[:, 1] if key == "lex" else 0)
        order = np.argsort(k, kind="stable")

    o, d = o[order], d[order]
    true_t, hit_cid = true_t[order], hit_cid[order]
    ntiles = N // TILE
    rng = np.random.default_rng(7)
    pick = rng.choice(ntiles, size=min(SAMPLE_TILES, ntiles), replace=False)

    ti_iters, lane_max, svisits = [], [], []
    for ti in pick:
        sl = slice(ti * TILE, (ti + 1) * TILE)
        e = entries(o[sl], d[sl])              # (TILE, C)
        tt, hc = true_t[sl], hit_cid[sl]
        # per-lane needed count: clusters entered before the lane's true t
        # (its own front-to-back walk tests exactly these)
        nc = (e < tt[:, None]).sum(1) + 1
        lane_max.append(nc.max())
        # per-tile front-to-back selection with early exit; bound drops to
        # true t when the hit cluster is tested
        best = np.full(TILE, 1e4, np.float32)
        tested = np.zeros(C, bool)
        it = 0
        ee = e.copy()
        while True:
            live = ee < best[:, None]
            if not live.any():
                break
            c = int(np.where(live, ee, np.inf).min(0).argmin())
            tested[c] = True
            ee[:, c] = np.inf
            best = np.where(hc == c, np.minimum(best, tt), best)
            it += 1
        ti_iters.append(it)
        svisits.append(len(np.unique(np.nonzero(tested)[0] // SUPER)))
    ti_iters, lane_max, svisits = map(np.asarray, (ti_iters, lane_max, svisits))
    print(f"[{tag}] key={key}: tile-select iters mean {ti_iters.mean():.2f} "
          f"p90 {np.percentile(ti_iters, 90):.0f} | lane-max mean "
          f"{lane_max.mean():.2f} p90 {np.percentile(lane_max, 90):.0f} | "
          f"super visits mean {svisits.mean():.2f}", flush=True)


for tag in ("primary", "bounce1srt", "bounce2srt"):
    for key in ("none", "slot0", "lex", "approx"):
        study(tag, key)

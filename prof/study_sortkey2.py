"""Offline search for a KERNEL-CHEAP cull sort key that reproduces the
exact slot0 collapse (study_courtsort: bounce1 tile-select iters 56.5 ->
6.2 under exact nearest-cluster ordering, but the shipped group-based
approximation degenerates to unsorted — every containing box's entry
clamps to 0, so "nearest entered group" carries no information in an
enclosed scene).

Candidate keys (all vectorized; tile-select-iter cost model from
study_courtsort):
  none     — identity ordering (tri-sorted dump order for bounce sets)
  slot0    — exact: argmin of clamped entry over ALL clusters (ties ->
             lowest id = lowest-id containing cluster)
  tightc   — argmax of UNCLAMPED lo among containing clusters (tightest
             containing box), fallback nearest forward entry
  grptight — group level: tightest containing group (unclamped lo argmax),
             then slot0 rule within that group's 128 clusters (the
             current kernel shape: one group gather + 128-cluster scan)
  grpt2    — like grptight but 2-level key (c0 from group, c1 = 2nd)
  cellO    — origin cell (scene-box /8 per axis) + direction octant
  cellF    — origin cell /16 + direction octant

Run: PYTHONPATH= JAX_PLATFORMS=cpu python -u prof/study_sortkey2.py
"""
import sys; sys.path.insert(0, "/root/repo")

import numpy as np

import jax
jax.config.update("jax_platforms", "cpu")

from rayfinder_tpu.render.scene import build_device_scene
from rayfinder_tpu.scene.procedural import courtyard_scene

TILE = 128
SUPER = 64
SAMPLE_TILES = 256

flat, textures = courtyard_scene(26)
scene = build_device_scene(flat, textures=textures)
C = scene.cluster_tris.shape[0]
L = scene.cluster_tris.shape[1]
cmin = np.asarray(scene.cluster_min)
cmax = np.asarray(scene.cluster_max)
tri_map = np.asarray(scene.cluster_tri_map)

tri_cluster = np.full(int(tri_map.max()) + 2, -1, np.int64)
valid = tri_map >= 0
tri_cluster[tri_map[valid]] = np.arange(C * L)[valid] // L

z = np.load("/tmp/court_rays.npz")

G = 128
s = -(-C // G)
gmin = np.full((s, 3), np.inf, np.float32)
gmax = np.full((s, 3), -np.inf, np.float32)
for g in range(s):
    sl = slice(g * G, min((g + 1) * G, C))
    gmin[g] = cmin[sl].min(0)
    gmax[g] = cmax[sl].max(0)


def slab(o, d, bmin, bmax):
    """Unclamped (lo, hi) for each ray x box."""
    inv = 1.0 / d
    lo = (bmin[None] - o[:, None]) * inv[:, None]
    hi = (bmax[None] - o[:, None]) * inv[:, None]
    t0 = np.minimum(lo, hi).max(2)
    t1 = np.maximum(lo, hi).min(2)
    return t0, t1


SA = ((cmax - cmin)[:, 0] * (cmax - cmin)[:, 1]
      + (cmax - cmin)[:, 1] * (cmax - cmin)[:, 2]
      + (cmax - cmin)[:, 0] * (cmax - cmin)[:, 2])


def hcp_of(o):
    """Tightest (min-SA) cluster box containing the point; -1 if none."""
    N = len(o)
    out = np.full(N, -1, np.int64)
    for st_ in range(0, N, 8192):
        sl = slice(st_, min(st_ + 8192, N))
        oo = o[sl]
        inside = ((oo[:, None, :] >= cmin[None]) &
                  (oo[:, None, :] <= cmax[None])).all(2)
        sak = np.where(inside, SA[None], np.inf)
        has = inside.any(1)
        out[sl] = np.where(has, sak.argmin(1), -1)
    return out


def key_of(kind, o, d):
    N = len(o)
    out = np.zeros(N, np.int64)
    if kind == "ptabS":
        # Production-realizable table: for each (cluster, octant) bucket,
        # sample origins on the cluster's triangles + uniform directions in
        # the octant, key = mode of exact tightc over the samples.
        rng = np.random.default_rng(11)
        tris_tab = np.asarray(scene.cluster_tris)  # (C, L, 3, 3)
        NS = 16
        table = np.zeros((C + 1, 8), np.int64)
        for c in range(C):
            tv = tris_tab[c]
            areas = np.linalg.norm(
                np.cross(tv[:, 1] - tv[:, 0], tv[:, 2] - tv[:, 0]), axis=1)
            areas = np.where(np.isfinite(areas), areas, 0.0)
            if areas.sum() <= 0:
                continue
            pr = areas / areas.sum()
            for oc in range(8):
                ti = rng.choice(L, NS, p=pr)
                r1 = np.sqrt(rng.random(NS)); r2 = rng.random(NS)
                a = 1 - r1; b = r1 * (1 - r2); g = r1 * r2
                oo = (a[:, None] * tv[ti, 0] + b[:, None] * tv[ti, 1]
                      + g[:, None] * tv[ti, 2]).astype(np.float32)
                dd = rng.random((NS, 3)).astype(np.float32) + 1e-3
                sx = np.asarray([(1 if oc & 4 else -1), (1 if oc & 2 else -1),
                                 (1 if oc & 1 else -1)], np.float32)
                dd = dd * sx
                dd /= np.linalg.norm(dd, axis=1, keepdims=True)
                tk = key_of("tightc", oo, dd)
                vals, cnts = np.unique(tk, return_counts=True)
                table[c, oc] = vals[cnts.argmax()]
        # Bucket EXACTLY as production would: by the PARENT hit triangle's
        # cluster (reconstructed from the dump's generation flow) — the
        # scatter ray's origin sits on that triangle.
        if CUR_TAG == "bounce1srt":
            phit = z["primary_hit"]
            ptri = np.maximum(z["primary_tri"], 0)[phit]
            order = np.argsort(ptri, kind="stable")
            pcid = tri_cluster[ptri[order]]
            bucket_c = np.where(pcid >= 0, pcid, C)
        else:
            hcp = hcp_of(o)
            bucket_c = np.where(hcp >= 0, hcp, C)
        oct_ = ((d[:, 0] > 0).astype(np.int64) * 4
                + (d[:, 1] > 0) * 2 + (d[:, 2] > 0))
        return table[bucket_c, oct_]
    if kind.startswith("hctan"):
        # PRE-SHADE key: parent hit cluster x tangent-frame direction cell.
        # In production the cell comes straight from the scatter NOISE
        # (cosine sampling is a bijection noise -> (phi, cos theta)), so
        # this key exists BEFORE the shade — it rides the tri-body sort
        # placement with no restructure and no extra permute columns.
        nb_ = int(kind[len("hctan"):])
        nphi = 8
        ncos = max(nb_ // nphi, 1)
        if CUR_TAG != "bounce1srt":
            return np.zeros(N, np.int64)  # primary: identity (pixel order)
        phit = z["primary_hit"]
        ptri = np.maximum(z["primary_tri"], 0)[phit]
        order0 = np.argsort(ptri, kind="stable")
        ptri_s = ptri[order0]
        pcid = tri_cluster[ptri_s]
        pd = z["primary_d"][phit][order0]
        sp_ = np.asarray(scene.tri_positions)
        v0, v1, v2 = sp_[ptri_s, 0], sp_[ptri_s, 1], sp_[ptri_s, 2]
        gn = np.cross(v1 - v0, v2 - v0)
        gn /= np.maximum(np.linalg.norm(gn, axis=1, keepdims=True), 1e-12)
        gn = np.where((np.einsum("ij,ij->i", gn, pd) > 0)[:, None], -gn, gn)
        # pixar onb (render/sampling.py convention)
        s_ = np.where(gn[:, 2] >= 0.0, 1.0, -1.0)
        a_ = -1.0 / (s_ + gn[:, 2])
        b_ = gn[:, 0] * gn[:, 1] * a_
        t1 = np.stack([1.0 + s_ * gn[:, 0] ** 2 * a_, s_ * b_,
                       -s_ * gn[:, 0]], 1)
        t2 = np.stack([b_, s_ + gn[:, 1] ** 2 * a_, -gn[:, 1]], 1)
        x_ = np.einsum("ij,ij->i", d, t1)
        y_ = np.einsum("ij,ij->i", d, t2)
        z_ = np.clip(np.einsum("ij,ij->i", d, gn), 0.0, 1.0)
        phi = np.arctan2(y_, x_)
        pb = np.clip(((phi / np.pi + 1) * 0.5 * nphi).astype(np.int64),
                     0, nphi - 1)
        cb = np.clip((z_ * ncos).astype(np.int64), 0, ncos - 1)
        return pcid * (nphi * ncos) + pb * ncos + cb
    if kind.startswith("dir") or kind.startswith("hcpdir"):
        # Free arithmetic keys: fine direction bins (cube-face x grid),
        # optionally parent-cluster-major. Costless in production
        # (elementwise math on the scatter direction + the existing hit
        # cluster id).
        nb_ = int(kind[len("hcpdir"):] if kind.startswith("hcpdir")
                  else kind[len("dir"):])
        side = max(int(np.sqrt(nb_ // 6)), 1)
        ax = np.abs(d).argmax(1)
        sgn = np.take_along_axis(d, ax[:, None], 1)[:, 0] > 0
        face = ax * 2 + sgn
        u_ = np.take_along_axis(d, ((ax + 1) % 3)[:, None], 1)[:, 0]
        v_ = np.take_along_axis(d, ((ax + 2) % 3)[:, None], 1)[:, 0]
        m_ = np.take_along_axis(np.abs(d), ax[:, None], 1)[:, 0]
        uu = np.clip(((u_ / m_ + 1) * 0.5 * side).astype(np.int64), 0, side - 1)
        vv = np.clip(((v_ / m_ + 1) * 0.5 * side).astype(np.int64), 0, side - 1)
        dbin = (face * side + uu) * side + vv
        if kind.startswith("hcpdir"):
            hcp = hcp_of(o)
            return (hcp + 1) * (6 * side * side) + dbin
        return dbin
    if kind.startswith("tightcK"):
        # tightc over COARSE boxes: unions of K consecutive clusters.
        # K=128 with clamped-entry group selection was useless (grptight);
        # this probes whether TIGHT-CONTAINMENT over small unions keeps the
        # slot0 collapse at 1/K the scan cost.
        K = int(kind[len("tightcK"):])
        nB = -(-C // K)
        bmin = np.full((nB, 3), np.inf, np.float32)
        bmax = np.full((nB, 3), -np.inf, np.float32)
        for b_ in range(nB):
            sl2 = slice(b_ * K, min((b_ + 1) * K, C))
            bmin[b_] = cmin[sl2].min(0)
            bmax[b_] = cmax[sl2].max(0)
        for st_ in range(0, N, 8192):
            sl = slice(st_, min(st_ + 8192, N))
            oo, dd = o[sl], d[sl]
            t0, t1 = slab(oo, dd, bmin, bmax)
            entered = (t0 <= t1) & (t1 > 0) & (t0 < 1e4)
            e = np.where(entered, np.maximum(t0, 0.0), np.inf)
            containing = entered & (t0 <= 0.0)
            tk = np.where(containing, t0, -np.inf)
            has = containing.any(1)
            out[sl] = np.where(has, tk.argmax(1), e.argmin(1))
        return out
    if kind in ("hcp", "hcpoct", "ptab"):
        hcp = hcp_of(o)
        oct_ = ((d[:, 0] > 0).astype(np.int64) * 4
                + (d[:, 1] > 0) * 2 + (d[:, 2] > 0))
        if kind == "hcp":
            return hcp + 1
        bucket = (hcp + 1) * 8 + oct_
        if kind == "hcpoct":
            return bucket
        # ptab: ORACLE ceiling — map each (hcp, octant) bucket to the MODE
        # of the exact tightc target over this very dump, then order by the
        # mapped target id. A scene-build-time table can at best match this.
        tgt = key_of("tightc", o, d)
        table = {}
        for b in np.unique(bucket):
            m = bucket == b
            vals, cnts = np.unique(tgt[m], return_counts=True)
            table[b] = vals[cnts.argmax()]
        return np.asarray([table[b] for b in bucket], np.int64)
    for st_ in range(0, N, 8192):
        sl = slice(st_, min(st_ + 8192, N))
        oo, dd = o[sl], d[sl]
        if kind in ("cellO", "cellF"):
            q = 8 if kind == "cellO" else 16
            smin, smax = cmin.min(0), cmax.max(0)
            cell = np.clip(((oo - smin) / (smax - smin) * q).astype(np.int64),
                           0, q - 1)
            oct_ = ((dd[:, 0] > 0).astype(np.int64) * 4
                    + (dd[:, 1] > 0) * 2 + (dd[:, 2] > 0))
            out[sl] = ((cell[:, 0] * q + cell[:, 1]) * q + cell[:, 2]) * 8 + oct_
            continue
        t0, t1 = slab(oo, dd, cmin, cmax)
        entered = (t0 <= t1) & (t1 > 0) & (t0 < 1e4)
        e = np.where(entered, np.maximum(t0, 0.0), np.inf)
        if kind == "slot0":
            c0 = e.argmin(1)
            e2 = e.copy(); e2[np.arange(len(oo)), c0] = np.inf
            c1 = e2.argmin(1)
            out[sl] = c0 * (C + 1) + c1
        elif kind == "tightc":
            containing = entered & (t0 <= 0.0)
            tk = np.where(containing, t0, -np.inf)
            has = containing.any(1)
            c_t = tk.argmax(1)
            c_n = e.argmin(1)
            out[sl] = np.where(has, c_t, c_n)
        elif kind in ("grptight", "grpt2"):
            g0, g1 = slab(oo, dd, gmin, gmax)
            gent = (g0 <= g1) & (g1 > 0) & (g0 < 1e4)
            gcont = gent & (g0 <= 0.0)
            gk = np.where(gcont, g0, -np.inf)
            ghas = gcont.any(1)
            ge = np.where(gent, np.maximum(g0, 0.0), np.inf)
            gstar = np.where(ghas, gk.argmax(1), ge.argmin(1))
            out_sl = np.zeros(len(oo), np.int64)
            for g in np.unique(gstar):
                m = gstar == g
                slc = slice(g * G, min((g + 1) * G, C))
                eg = e[m][:, slc]
                c0 = eg.argmin(1)
                if kind == "grpt2":
                    eg2 = eg.copy()
                    eg2[np.arange(m.sum()), c0] = np.inf
                    c1 = eg2.argmin(1)
                    out_sl[m] = (g * G + c0) * (C + 1) + g * G + c1
                else:
                    out_sl[m] = g * G + c0
            out[sl] = out_sl
        else:
            raise ValueError(kind)
    return out


def entries(o, d):
    t0, t1 = slab(o, d, cmin, cmax)
    ok = (t0 <= t1) & (t0 < 1e4) & (t1 > 0.0)
    return np.where(ok, np.maximum(t0, 0.0), np.inf).astype(np.float32)


CUR_TAG = None


def study(tag, kind):
    global CUR_TAG
    CUR_TAG = tag
    o, d = z[f"{tag}_o"], z[f"{tag}_d"]
    hit, t, tri = z[f"{tag}_hit"], z[f"{tag}_t"], z[f"{tag}_tri"]
    true_t = np.where(hit, t, 1e4).astype(np.float32)
    hit_cid = np.where(hit, tri_cluster[np.maximum(tri, 0)], -1)
    N = len(o)
    if kind == "none":
        order = np.arange(N)
    else:
        order = np.argsort(key_of(kind, o, d), kind="stable")
    o, d = o[order], d[order]
    true_t, hit_cid = true_t[order], hit_cid[order]
    ntiles = N // TILE
    rng = np.random.default_rng(7)
    pick = rng.choice(ntiles, size=min(SAMPLE_TILES, ntiles), replace=False)
    ti_iters, svisits = [], []
    for ti in pick:
        sl = slice(ti * TILE, (ti + 1) * TILE)
        e = entries(o[sl], d[sl])
        tt, hc = true_t[sl], hit_cid[sl]
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
    ti_iters, svisits = map(np.asarray, (ti_iters, svisits))
    print(f"[{tag}] key={kind}: tile-select iters mean {ti_iters.mean():.2f} "
          f"p90 {np.percentile(ti_iters, 90):.0f} | super visits mean "
          f"{svisits.mean():.2f}", flush=True)


import os as _os
KEYS = _os.environ.get(
    "KEYS", "none,slot0,tightc,grptight,grpt2,cellO,cellF").split(",")
for tag in ("bounce1srt", "primary"):
    for kind in KEYS:
        study(tag, kind)

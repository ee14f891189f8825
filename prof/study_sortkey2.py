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


def key_of(kind, o, d):
    N = len(o)
    out = np.zeros(N, np.int64)
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


def study(tag, kind):
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


for tag in ("bounce1srt", "primary"):
    for kind in ("none", "slot0", "tightc", "grptight", "grpt2", "cellO",
                 "cellF"):
        study(tag, kind)

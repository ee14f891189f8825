"""Mixed-population ordering study: production fused-loop tiles hold lanes
at DIFFERENT bounce depths (in-kernel regeneration turns a bounce lane into
a fresh primary mid-call), while the per-population studies measured pure
bounce sets. Concatenate the dumped primary/bounce1/bounce2 populations and
compare per-tile super visits under:

  concat   — populations back to back (each internally tri-sorted) = the
             BEST CASE a per-population study implies
  shuffle  — random interleave = worst-case mixing
  dirglob  — one global (hc x dirbin) sort across the mix (what
             RAYFINDER_SORT_KEY=dir actually does)
  bdir     — (bounce, hc, dirbin): bounce-major separation first

Run: PYTHONPATH= JAX_PLATFORMS=cpu python -u prof/study_mixed.py
"""
import sys; sys.path.insert(0, "/root/repo")

import numpy as np

import jax
jax.config.update("jax_platforms", "cpu")

from rayfinder_tpu.render.scene import build_device_scene
from rayfinder_tpu.scene.procedural import courtyard_scene

TILE = 128
SUPER = 64
SAMPLE_TILES = 384

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

# Parent cluster per bounce ray (the production dir key's hc): bounce1's
# parents are the primary hits re-sorted by parent tri; bounce2's are the
# bounce1 hits re-sorted likewise. Primaries have no parent (hc = -1 ->
# production groups them by pixel; model: keep pixel order).
pop = []
for bi, tag in enumerate(("primary", "bounce1srt", "bounce2srt")):
    o, d = z[f"{tag}_o"], z[f"{tag}_d"]
    hit, t, tri = z[f"{tag}_hit"], z[f"{tag}_t"], z[f"{tag}_tri"]
    if tag == "primary":
        hc = np.full(len(o), -1, np.int64)
    else:
        prev = "primary" if bi == 1 else "bounce1srt"
        phit = z[f"{prev}_hit"]
        ptri = np.maximum(z[f"{prev}_tri"], 0)[phit]
        order = np.argsort(ptri, kind="stable")
        hc = tri_cluster[ptri[order]]
    pop.append(dict(o=o, d=d, bounce=np.full(len(o), bi),
                    hc=hc,
                    true_t=np.where(hit, t, 1e4).astype(np.float32),
                    hit_cid=np.where(hit, tri_cluster[np.maximum(tri, 0)],
                                     -1)))

o = np.concatenate([p["o"] for p in pop])
d = np.concatenate([p["d"] for p in pop])
bounce = np.concatenate([p["bounce"] for p in pop])
hc = np.concatenate([p["hc"] for p in pop])
true_t = np.concatenate([p["true_t"] for p in pop])
hit_cid = np.concatenate([p["hit_cid"] for p in pop])
N = len(o)
print(f"mixed population: {N} rays "
      f"({[len(p['o']) for p in pop]})", flush=True)


def dirbin(d):
    ad = np.abs(d)
    is_x = (ad[:, 0] >= ad[:, 1]) & (ad[:, 0] >= ad[:, 2])
    is_y = ~is_x & (ad[:, 1] >= ad[:, 2])
    m = np.maximum(ad.max(1), 1e-20)
    ds2 = np.where(is_x, d[:, 0], np.where(is_y, d[:, 1], d[:, 2]))
    face = np.where(is_x, 0, np.where(is_y, 2, 4)) + (ds2 > 0)
    u2 = np.where(is_x, d[:, 1], np.where(is_y, d[:, 2], d[:, 0]))
    v2 = np.where(is_x, d[:, 2], np.where(is_y, d[:, 0], d[:, 1]))
    ub = np.clip(((u2 / m + 1.0) * 2.0).astype(np.int64), 0, 3)
    vb = np.clip(((v2 / m + 1.0) * 2.0).astype(np.int64), 0, 3)
    return (face * 4 + ub) * 4 + vb


def entries(o, d):
    inv = 1.0 / d
    lo = (cmin[None] - o[:, None]) * inv[:, None]
    hi = (cmax[None] - o[:, None]) * inv[:, None]
    t0 = np.minimum(lo, hi).max(2)
    t1 = np.maximum(lo, hi).min(2)
    ok = (t0 <= t1) & (t0 < 1e4) & (t1 > 0.0)
    return np.where(ok, np.maximum(t0, 0.0), np.inf).astype(np.float32)


def study(kind):
    if kind == "concat":
        order = np.arange(N)
    elif kind == "shuffle":
        order = np.random.default_rng(3).permutation(N)
    else:
        db = dirbin(d)
        key = np.where(hc >= 0, hc * 96 + db, 2**28 + np.arange(N))
        if kind == "bdir":
            key = bounce * 2**30 + key
        order = np.argsort(key, kind="stable")
    oo, dd = o[order], d[order]
    tt_, hc_ = true_t[order], hit_cid[order]
    ntiles = N // TILE
    rng = np.random.default_rng(7)
    pick = rng.choice(ntiles, size=min(SAMPLE_TILES, ntiles), replace=False)
    lane_max, svisits = [], []
    for ti in pick:
        sl = slice(ti * TILE, (ti + 1) * TILE)
        e = entries(oo[sl], dd[sl])
        # per-lane selection sweep: lane tests clusters entered before its
        # own true t; tile visits = union of SUPER ranges over those
        need = e < tt_[sl][:, None]
        lane_max.append(need.sum(1).max())
        anyc = need.any(0)
        svisits.append(len(np.unique(np.nonzero(anyc)[0] // SUPER)))
    lane_max, svisits = map(np.asarray, (lane_max, svisits))
    print(f"key={kind:8s}: lane-max mean {lane_max.mean():6.2f} "
          f"p90 {np.percentile(lane_max, 90):5.0f} | super visits mean "
          f"{svisits.mean():5.2f} p90 {np.percentile(svisits, 90):4.0f}",
          flush=True)


for kind in ("concat", "shuffle", "dirglob", "bdir"):
    study(kind)

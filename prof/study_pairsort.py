"""Offline study: per-SLOT cluster coherence of nearest-W pair traversal
with rays SORTED by their nearest-cluster id (the proposed Pallas pair
engine). Uses the dumped courtyard ray sets + true hits
(/tmp/court_rays.npz from prof/dump_court_rays.py).

For each ray: nearest-W cluster entries/ids (slab vs all C AABBs). Sort
rays by slot-0 id. Simulate slot-by-slot MT: after testing slot w, a ray's
bound drops to its true hit t if the hit's cluster was tested. A tile's
cost for slot w = number of DISTINCT cluster ids among its ACTIVE lanes
(entry_w < bound) — each distinct id is one DMA+MT iteration in the
proposed kernel. Reports iterations/tile/slot, unresolved tail sizes, and
the implied per-pass kernel iteration total vs the grouped sweep's
measured ~18 super visits + ~20 cluster iterations per 128-lane tile.

Run: PYTHONPATH= JAX_PLATFORMS=cpu python -u prof/study_pairsort.py [W]
"""
import sys; sys.path.insert(0, "/root/repo")

import numpy as np

import jax
jax.config.update("jax_platforms", "cpu")

from rayfinder_tpu.render.scene import build_device_scene
from rayfinder_tpu.scene.procedural import courtyard_scene

W = int(sys.argv[1]) if len(sys.argv) > 1 else 3
TILE = 128

flat, textures = courtyard_scene(26)
scene = build_device_scene(flat, textures=textures)
C = scene.cluster_tris.shape[0]
L = scene.cluster_tris.shape[1]
cmin = np.asarray(scene.cluster_min)
cmax = np.asarray(scene.cluster_max)
tri_map = np.asarray(scene.cluster_tri_map)  # (C*L,) slot -> real tri
print(f"clusters {C} leaf {L} W {W}")

# real tri -> cluster
tri_cluster = np.full(int(tri_map.max()) + 2, -1, np.int64)
valid = tri_map >= 0
tri_cluster[tri_map[valid]] = np.arange(C * L)[valid] // L

z = np.load("/tmp/court_rays.npz")


def top_entries(o, d, k):
    inv = 1.0 / d
    neg = inv < 0.0
    N = len(o)
    ents = np.full((N, k), np.inf, np.float32)
    cids = np.zeros((N, k), np.int32)
    for s in range(0, N, 8192):
        sl = slice(s, min(s + 8192, N))
        near = np.where(neg[sl, None, :], cmax[None], cmin[None])
        far = np.where(neg[sl, None, :], cmin[None], cmax[None])
        t0 = (near - o[sl, None, :]) * inv[sl, None, :]
        t1 = (far - o[sl, None, :]) * inv[sl, None, :]
        tmin = np.max(t0, axis=-1)
        tmax = np.min(t1, axis=-1)
        ok = (tmin <= tmax) & (tmin < 1e4) & (tmax > 0.0)
        e = np.where(ok, np.maximum(tmin, 0.0), np.inf)
        idx = np.argsort(e, axis=1)[:, :k]
        ents[sl] = np.take_along_axis(e, idx, 1)
        cids[sl] = idx
    return ents, cids


def study(tag, key="lex"):
    o, d = z[f"{tag}_o"], z[f"{tag}_d"]
    hit, t, tri = z[f"{tag}_hit"], z[f"{tag}_t"], z[f"{tag}_tri"]
    true_t = np.where(hit, t, 1e4).astype(np.float32)
    hit_cid = np.where(hit, tri_cluster[np.maximum(tri, 0)], -1)
    N = len(o)
    e, c = top_entries(o, d, W + 1)

    # sort rays by nearest-cluster key (dead rays/misses ride along);
    # "none" keeps the caller's order (the dumped bounce sets are already
    # sorted by previous hit tri, as the regen loop does)
    if key == "lex":
        k = (c[:, 0].astype(np.int64) * C + c[:, 1]) * C + c[:, 2]
    elif key == "none":
        k = np.arange(N, dtype=np.int64)
    else:
        k = c[:, 0].astype(np.int64)
    order = np.argsort(k, kind="stable")
    e, c = e[order], c[order]
    true_t, hit_cid = true_t[order], hit_cid[order]

    ntiles = (N + TILE - 1) // TILE
    pad = ntiles * TILE - N
    if pad:
        e = np.pad(e, ((0, pad), (0, 0)), constant_values=np.inf)
        c = np.pad(c, ((0, pad), (0, 0)), constant_values=-1)
        true_t = np.pad(true_t, (0, pad), constant_values=0.0)
        hit_cid = np.pad(hit_cid, (0, pad), constant_values=-1)

    # UNION-ERASE simulation (the proposed kernel): per tile, repeatedly take
    # the nearest active (lane, slot) pair's cluster, MT it against ALL lanes
    # (every lane's bound can only tighten; modeled: a lane's bound drops to
    # its true t when its hit cluster is the one tested), erase that id from
    # every slot, repeat. Iterations = distinct ids actually visited.
    iters = np.zeros(ntiles, np.int64)
    bound = np.full(ntiles * TILE, 1e4, np.float32)
    eT = e[:, :W].reshape(ntiles, TILE, W).copy()
    cT = c[:, :W].reshape(ntiles, TILE, W)
    bT = bound.reshape(ntiles, TILE)
    tT = true_t.reshape(ntiles, TILE)
    hT = hit_cid.reshape(ntiles, TILE)
    for ti in range(ntiles):
        et, ct, bt = eT[ti], cT[ti], bT[ti]
        while True:
            act = et < bt[:, None]
            if not act.any():
                break
            lane, slot = np.unravel_index(np.argmin(np.where(act, et, np.inf)),
                                          et.shape)
            cid = ct[lane, slot]
            iters[ti] += 1
            # MT cluster cid for all lanes: lanes whose hit lives there resolve
            bt[:] = np.where(hT[ti] == cid, np.minimum(bt, tT[ti]), bt)
            et[ct == cid] = np.inf
        bT[ti] = bt
    unresolved = e[:, W] < bound
    grouped_iters = 18 + 20  # measured super visits + cluster iterations
    print(f"[{tag}] key={key} N={N} tiles={ntiles}")
    print(f"  union-erase iters/tile mean {iters.mean():.2f} "
          f"q{np.percentile(iters, [50, 90, 99]).round(1).tolist()} "
          f"vs grouped-sweep ~{grouped_iters}")
    print(f"  unresolved after W={W}: {unresolved.mean():.4f} "
          f"({unresolved.sum()} rays -> pallas tail)", flush=True)


import os
keys = os.environ.get("KEYS", "slot0,lex").split(",")
for tag in ("primary", "bounce1srt", "bounce2srt"):
    for key in keys:
        study(tag, key)

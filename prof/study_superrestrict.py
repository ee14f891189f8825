"""Offline study: SUPER-restricted tile sweeps — each lane limited to its
top-W nearest supers (by super-box entry), rays sorted by nearest-super id.

Simulates the proposed minimal change to the grouped sweep: per tile,
visits = union-erase over lanes' top-W supers (each visit pays the DMA +
entry build + selection setup), inner iterations per visit = max over the
tile's lanes of clusters-with-entry<bound inside that super (the per-lane
_SUB=1 selection already achieves this). A lane is PROVEN done iff its
best hit t <= its (W+1)-th super entry; the rest re-walk compacted in the
full (unrestricted) sweep.

Baselines measured on TPU (prof/diag_iters.py, 2026-08-18): bounce tiles
visit 16-19 of 24 supers with ~20.8 inner iterations; primaries 7.1 visits
/ 2.9 iterations.

Run: PYTHONPATH= JAX_PLATFORMS=cpu python -u prof/study_superrestrict.py [W]
"""
import sys; sys.path.insert(0, "/root/repo")

import numpy as np

import jax
jax.config.update("jax_platforms", "cpu")

from rayfinder_tpu.render.scene import build_device_scene
from rayfinder_tpu.scene.procedural import courtyard_scene

W = int(sys.argv[1]) if len(sys.argv) > 1 else 2
TILE = 128

flat, textures = courtyard_scene(26)
scene = build_device_scene(flat, textures=textures)
C = scene.cluster_tris.shape[0]
L = scene.cluster_tris.shape[1]
cmin = np.asarray(scene.cluster_min)
cmax = np.asarray(scene.cluster_max)
tri_map = np.asarray(scene.cluster_tri_map)
from rayfinder_tpu.bvh.clusters import SUPER_GROUP as G
S = (C + G - 1) // G
print(f"clusters {C} leaf {L} supers {S} (G={G}) W {W}")

pad = S * G - C
cmin_p = np.pad(cmin, ((0, pad), (0, 0)), constant_values=1e30)
cmax_p = np.pad(cmax, ((0, pad), (0, 0)), constant_values=1e30)
is_pad = cmin_p[:, 0] >= 1e30
gmin = np.where(is_pad[:, None], np.inf, cmin_p).reshape(S, G, 3).min(1)
gmax = np.where(is_pad[:, None], -np.inf, cmax_p).reshape(S, G, 3).max(1)

tri_cluster = np.full(int(tri_map.max()) + 2, -1, np.int64)
valid = tri_map >= 0
tri_cluster[tri_map[valid]] = np.arange(C * L)[valid] // L

z = np.load("/tmp/court_rays.npz")


def slab(o, d, bmin, bmax, t_max):
    inv = 1.0 / d
    neg = inv < 0.0
    near = np.where(neg[:, None, :], bmax[None], bmin[None])
    far = np.where(neg[:, None, :], bmin[None], bmax[None])
    t0 = (near - o[:, None, :]) * inv[:, None, :]
    t1 = (far - o[:, None, :]) * inv[:, None, :]
    tmin = np.max(t0, axis=-1)
    tmax = np.min(t1, axis=-1)
    ok = (tmin <= tmax) & (tmin < t_max) & (tmax > 0.0)
    return np.where(ok, np.maximum(tmin, 0.0), np.inf)


def study(tag):
    o, d = z[f"{tag}_o"], z[f"{tag}_d"]
    hit, t, tri = z[f"{tag}_hit"], z[f"{tag}_t"], z[f"{tag}_tri"]
    true_t = np.where(hit, t, 1e4).astype(np.float32)
    hit_cid = np.where(hit, tri_cluster[np.maximum(tri, 0)], -1)
    hit_sid = np.where(hit, hit_cid // G, -1)
    N = len(o)

    se = np.full((N, S), np.inf, np.float32)
    for s0 in range(0, N, 16384):
        sl = slice(s0, min(s0 + 16384, N))
        se[sl] = slab(o[sl], d[sl], gmin, gmax, 1e4)
    order_s = np.argsort(se, axis=1)[:, :W + 1]
    topW = np.take_along_axis(se, order_s, 1)  # (N, W+1) entries ascending
    sidW = order_s.astype(np.int32)

    # sort rays by nearest-super id
    perm = np.argsort(sidW[:, 0] + S * (topW[:, 0] == np.inf), kind="stable")
    topW, sidW = topW[perm], sidW[perm]
    true_t, hit_cid, hit_sid = true_t[perm], hit_cid[perm], hit_sid[perm]
    o2, d2 = o[perm], d[perm]

    ntiles = (N + TILE - 1) // TILE
    padn = ntiles * TILE - N
    if padn:
        topW = np.pad(topW, ((0, padn), (0, 0)), constant_values=np.inf)
        sidW = np.pad(sidW, ((0, padn), (0, 0)), constant_values=-1)
        true_t = np.pad(true_t, (0, padn), constant_values=0.0)
        hit_cid = np.pad(hit_cid, (0, padn), constant_values=-1)
        hit_sid = np.pad(hit_sid, (0, padn), constant_values=-1)
        o2 = np.pad(o2, ((0, padn), (0, 0)))
        d2 = np.pad(d2, ((0, padn), (0, 0)), constant_values=1.0)

    visits = np.zeros(ntiles, np.int64)
    inner = np.zeros(ntiles, np.int64)
    bound_all = np.full(ntiles * TILE, 1e4, np.float32)
    for ti in range(ntiles):
        rows = slice(ti * TILE, (ti + 1) * TILE)
        et = topW[rows, :W].copy()
        st = sidW[rows, :W]
        bt = bound_all[rows].copy()
        # per-lane cluster entries for inner-iteration counts (lazy per super)
        while True:
            act = et < bt[:, None]
            if not act.any():
                break
            lane, slot = np.unravel_index(
                np.argmin(np.where(act, et, np.inf)), et.shape)
            sid = st[lane, slot]
            visits[ti] += 1
            # inner iterations: max over lanes of in-super clusters with
            # cluster entry < lane bound (per-lane _SUB selection)
            cl = slice(sid * G, min((sid + 1) * G, C))
            ce = slab(o2[rows], d2[rows], cmin[cl], cmax[cl], 1e4)
            need = (ce < bt[:, None]).sum(1)
            inner[ti] += need.max()
            # resolve lanes whose hit super is this one
            res = hit_sid[rows] == sid
            bt = np.where(res, np.minimum(bt, true_t[rows]), bt)
            et[st == sid] = np.inf
        bound_all[rows] = bt
    unresolved = topW[:, W] < bound_all
    print(f"[{tag}] N={N} tiles={ntiles}")
    print(f"  visits/tile mean {visits.mean():.2f} "
          f"q{np.percentile(visits, [50, 90, 99]).round(1).tolist()} "
          f"(grouped sweep: bounce 16-19, primary 7.1)")
    print(f"  inner iters/tile mean {inner.mean():.2f} "
          f"q{np.percentile(inner, [50, 90, 99]).round(1).tolist()} "
          f"(grouped sweep: bounce ~20.8, primary ~2.9)")
    print(f"  unresolved after W={W}: {unresolved.mean():.4f} "
          f"({unresolved.sum()} rays -> full-sweep tail)", flush=True)


for tag in ("primary", "bounce1srt", "bounce2srt"):
    study(tag)

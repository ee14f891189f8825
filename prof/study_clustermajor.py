"""Offline (CPU) feasibility study for cluster-major traversal on the
courtyard: how many (ray, cluster) pairs does each wave of the proposed
scheme touch, vs the per-ray need and vs the tile sweep's union cost?

Scheme under study (see VERDICT r3 Next #2):
  wave 1: MT each ray's W nearest overlapped clusters (front-to-back)
  wave 2: enumerate remaining pairs with entry < best_t, cluster-major
Reports per-ray overlap counts, remaining-after-wave1 distribution, and
the implied MT-block counts per 49152-ray round.

Run: PYTHONPATH= JAX_PLATFORMS=cpu python -u prof/study_clustermajor.py [scale] [nrays]
"""
import sys; sys.path.insert(0, "/root/repo")
import os

import numpy as np

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from rayfinder_tpu.render.camera import create_camera, generate_camera_ray
from rayfinder_tpu.render.sampling import sample_cosine_hemisphere
from rayfinder_tpu.render.scene import build_device_scene
from rayfinder_tpu.render.wavefront import intersect_closest_wavefront
from rayfinder_tpu.scene.procedural import courtyard_scene

scale = int(sys.argv[1]) if len(sys.argv) > 1 else 26
N = int(sys.argv[2]) if len(sys.argv) > 2 else 32768
W = H = 512

flat, textures = courtyard_scene(scale)
scene = build_device_scene(flat, textures=textures)
C = scene.cluster_tris.shape[0]
L = scene.cluster_tris.shape[1]
print(f"tris {flat.positions.shape[0]} clusters {C} leaf {L}")

rng = np.random.default_rng(7)
camera = create_camera([-16.0, 5.0, 0.0], [12.0, 2.0, 0.0], 0.0, 1.0,
                       70.0, W / H)
pix = rng.choice(W * H, size=N, replace=False)
u = ((pix % W) + 0.5).astype(np.float32) / W
v = 1.0 - ((pix // W) + 0.5).astype(np.float32) / H
o, d = generate_camera_ray(camera, jnp.asarray(u), jnp.asarray(v))
o, d = np.asarray(o), np.asarray(d)

sp = np.asarray(scene.tri_positions)
cmin, cmax = np.asarray(scene.cluster_min), np.asarray(scene.cluster_max)


def trace(o, d):
    hit, t, tri, esc = intersect_closest_wavefront(
        scene, jnp.asarray(o), jnp.asarray(d), jnp.float32(1e4))
    return np.asarray(hit), np.asarray(t), np.asarray(tri), int(esc)


def bounce(o, d, t, tri, hit):
    p = o + t[:, None] * d
    trin = np.maximum(tri, 0)
    v0, v1, v2 = sp[trin, 0], sp[trin, 1], sp[trin, 2]
    gn = np.cross(v1 - v0, v2 - v0)
    gn /= np.maximum(np.linalg.norm(gn, axis=1, keepdims=True), 1e-12)
    gn = np.where((np.einsum("ij,ij->i", gn, d) > 0)[:, None], -gn, gn)
    noise = rng.random((len(o), 2)).astype(np.float32)
    nd = np.asarray(sample_cosine_hemisphere(jnp.asarray(noise), jnp.asarray(gn)))
    no = p + 1e-4 * gn
    return no[hit], nd[hit]


def entries(o, d, t_max):
    """(N, C) slab entry (inf = miss), numpy, chunked."""
    inv = 1.0 / d
    neg = inv < 0.0
    out = np.full((len(o), C), np.inf, np.float32)
    for s in range(0, len(o), 8192):
        sl = slice(s, min(s + 8192, len(o)))
        near = np.where(neg[sl, None, :], cmax[None], cmin[None])
        far = np.where(neg[sl, None, :], cmin[None], cmax[None])
        t0 = (near - o[sl, None, :]) * inv[sl, None, :]
        t1 = (far - o[sl, None, :]) * inv[sl, None, :]
        tmin = np.max(t0, axis=-1)
        tmax = np.min(t1, axis=-1)
        ok = (tmin <= tmax) & (tmin < t_max[sl, None]) & (tmax > 0.0)
        out[sl] = np.where(ok, np.maximum(tmin, 0.0), np.inf)
    return out


def mt_best(o, d, cid, bound):
    """Exact best-t of rays vs one cluster id each (numpy MT, eps=1e-5)."""
    blocks = np.asarray(scene.cluster_tris)[cid]  # (n, L, 3, 3)
    v0 = blocks[:, :, 0]
    e1 = blocks[:, :, 1] - v0
    e2 = blocks[:, :, 2] - v0
    dv = d[:, None, :]
    pv = np.cross(dv, e2)
    det = np.einsum("nlk,nlk->nl", e1, pv)
    inv = np.where(np.abs(det) > 1e-12, 1.0 / det, 0.0)
    tv = o[:, None, :] - v0
    uu = np.einsum("nlk,nlk->nl", tv, pv) * inv
    qv = np.cross(tv, e1)
    vv = np.einsum("nk,nlk->nl", d, qv) * inv
    tt = np.einsum("nlk,nlk->nl", e2, qv) * inv
    eps = 1e-5
    ok = (np.abs(det) > 0) & (uu >= -eps) & (vv >= -eps) & (uu + vv <= 1 + eps) \
        & (tt > eps) & (tt < bound[:, None])
    tt = np.where(ok, tt, np.inf)
    return tt.min(axis=1)


def study(tag, o, d, true_t, W1=2):
    N = len(o)
    e = entries(o, d, np.full(N, 1e4, np.float32))
    finite = np.isfinite(e)
    overlap = finite.sum(1)
    # per-ray need (front-to-back until entry >= true hit t)
    need = (e < true_t[:, None]).sum(1)
    order = np.argsort(e, axis=1)
    # wave 1: MT the W1 nearest clusters
    best = np.full(N, 1e4, np.float32)
    for w in range(W1):
        cid = order[:, w]
        act = np.take_along_axis(e, order[:, w:w+1], 1)[:, 0] < best
        t = mt_best(o, d, cid, best)
        best = np.where(act, np.minimum(best, t), best)
    # wave 2: remaining = untested clusters with entry < best
    rem = (e < best[:, None])
    rem[np.arange(N)[:, None], order[:, :W1]] = False
    remcount = rem.sum(1)
    pairs2 = remcount.sum()
    # block counts at 128 pairs/cluster-block, sublane pad 8
    per_c = rem.sum(0)
    blocks2 = np.ceil(per_c / 128).sum()
    pad8 = (np.ceil(per_c / 8) * 8).sum()
    q = lambda x: np.percentile(x, [50, 90, 99, 100]).round(1).tolist()
    print(f"[{tag}] N={N} overlap mean {overlap.mean():.2f} q{q(overlap)} | "
          f"need mean {need.mean():.2f} q{q(need)}")
    print(f"[{tag}] wave1(W={W1}) resolves exact-t for "
          f"{(best <= true_t + 1e-6).mean():.3f}; remaining pairs "
          f"mean {remcount.mean():.2f} q{q(remcount)} total {pairs2} "
          f"({pairs2/N:.2f}/ray) live rays {(remcount>0).mean():.3f}")
    print(f"[{tag}] wave2 cluster blocks(128) {blocks2:.0f} "
          f"pad8 rows {pad8:.0f} ({pad8/N:.2f}/ray) "
          f"| wave1 rows {W1*N} | tile-sweep MT rows/ray (measured ~20 "
          f"iters/tile -> {20.0:.0f}/ray-equivalent)")
    return e


hit, t, tri, esc = trace(o, d)
print("primary hit rate", hit.mean(), "esc", esc)
study("primary", o, d, np.where(hit, t, 1e4))

o1, d1 = bounce(o, d, t, tri, hit)
hit1, t1, tri1, esc1 = trace(o1, d1)
print("bounce1 hit rate", hit1.mean(), "esc", esc1)
study("bounce1", o1, d1, np.where(hit1, t1, 1e4))

o2, d2 = bounce(o1, d1, t1, tri1, hit1)
hit2, t2, tri2, esc2 = trace(o2, d2)
print("bounce2 hit rate", hit2.mean(), "esc", esc2)
study("bounce2", o2, d2, np.where(hit2, t2, 1e4))

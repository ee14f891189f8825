"""Duck: does (hit-cluster x direction-bin) lane sorting cut the flat tile
sweep's work? Production per-lane-selection model on bounce rays: per-tile
UNION of needed clusters (tile lockstep floor) and per-lane max need, under
tri-sorted vs dir-key vs unsorted orderings.

Run: PYTHONPATH= JAX_PLATFORMS=cpu python -u prof/study_ducksort.py
"""
import sys; sys.path.insert(0, "/root/repo")
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from rayfinder_tpu.render.wavefront import intersect_closest_wavefront
from rayfinder_tpu.render.sampling import sample_cosine_hemisphere
from rayfinder_tpu.render.camera import create_camera, generate_camera_ray
from rayfinder_tpu.render.scene import load_device_scene

scene = load_device_scene("/root/reference/assets/Duck.glb")
C = scene.cluster_tris.shape[0]
L = scene.cluster_tris.shape[1]
cmin = np.asarray(scene.cluster_min)
cmax = np.asarray(scene.cluster_max)
tri_map = np.asarray(scene.cluster_tri_map)
tri_cluster = np.full(int(tri_map.max()) + 2, -1, np.int64)
valid = tri_map >= 0
tri_cluster[tri_map[valid]] = np.arange(C * L)[valid] // L
print(f"clusters {C} leaf {L}")

W = H = 256
cam = create_camera([2.0, 1.5, 2.0], [0.1, 0.8, 0.0], 0.0, 1.0, 70.0, 1.0)
js, is_ = np.meshgrid(np.arange(W), np.arange(H), indexing="xy")
u = (js.reshape(-1) + 0.5).astype(np.float32) / W
v = 1.0 - (is_.reshape(-1) + 0.5).astype(np.float32) / H
o, d = generate_camera_ray(cam, jnp.asarray(u), jnp.asarray(v))
o = np.asarray(o); d = np.asarray(d)
hit, t, tri, _ = intersect_closest_wavefront(
    scene, jnp.asarray(o), jnp.asarray(d), jnp.float32(1e4))
hit = np.asarray(hit); t = np.asarray(t); tri = np.asarray(tri)
sp = np.asarray(scene.tri_positions)
trin = np.maximum(tri, 0)
p = o + t[:, None] * d
v0, v1, v2 = sp[trin, 0], sp[trin, 1], sp[trin, 2]
gn = np.cross(v1 - v0, v2 - v0)
gn /= np.maximum(np.linalg.norm(gn, axis=1, keepdims=True), 1e-12)
gn = np.where((np.einsum("ij,ij->i", gn, d) > 0)[:, None], -gn, gn)
rng = np.random.default_rng(5)
noise = rng.random((len(o), 2)).astype(np.float32)
wi = np.asarray(sample_cosine_hemisphere(jnp.asarray(noise), jnp.asarray(gn)))
o2 = (p + 1e-3 * gn)[hit]
d2 = wi[hit]
ptri = trin[hit]
hc = tri_cluster[ptri]
n2 = len(o2)
h2, t2, tr2, _ = intersect_closest_wavefront(
    scene, jnp.asarray(o2), jnp.asarray(d2), jnp.float32(1e4))
true_t = np.where(np.asarray(h2), np.asarray(t2), 1e4).astype(np.float32)
print("bounce rays", n2, "hit", float(np.asarray(h2).mean()))


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


TILE = 128
for kind in ("pixel", "tri", "dir", "tridir"):
    if kind == "pixel":
        order = np.arange(n2)
    elif kind == "tri":
        order = np.argsort(ptri, kind="stable")
    elif kind == "dir":
        order = np.argsort(hc * 96 + dirbin(d2), kind="stable")
    else:
        order = np.argsort(ptri * 96 + dirbin(d2), kind="stable")
    oo, dd = o2[order], d2[order]
    tt = true_t[order]
    ntiles = n2 // TILE
    union, lane_max = [], []
    for ti in range(ntiles):
        sl = slice(ti * TILE, (ti + 1) * TILE)
        e = entries(oo[sl], dd[sl])
        need = e < tt[sl][:, None]
        union.append(need.any(0).sum())
        lane_max.append(need.sum(1).max())
    union, lane_max = np.asarray(union), np.asarray(lane_max)
    print(f"key={kind:6s}: tile union mean {union.mean():5.2f} "
          f"p90 {np.percentile(union, 90):4.0f} | lane-max mean "
          f"{lane_max.mean():5.2f}", flush=True)

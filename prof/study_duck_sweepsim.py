"""Duck: simulate the flat tile sweep (front-to-back selection, early exit)
on bounce rays under unconditional vs SA-bounded vs no treelet merge."""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from rayfinder_tpu.render.wavefront import intersect_closest_wavefront
from rayfinder_tpu.render.sampling import sample_cosine_hemisphere
from rayfinder_tpu.render.camera import create_camera, generate_camera_ray
from rayfinder_tpu.bvh.clusters import treelet_ranges, build_clusters
from rayfinder_tpu.bvh.native import build_bvh_fast
from rayfinder_tpu.bvh import reorder_attributes
from rayfinder_tpu.render.scene import load_device_scene

scene = load_device_scene("/root/reference/assets/Duck.glb")
tp = np.asarray(scene.tri_positions)  # leaf-ordered (N,3,3)
bvh = build_bvh_fast(tp)
tp = np.asarray(reorder_attributes(tp, bvh.triangle_indices), np.float32)

W = H = 128
cam = create_camera([2.0, 1.5, 2.0], [0.1, 0.8, 0.0], 0.0, 1.0, 70.0, 1.0)
js, is_ = np.meshgrid(np.arange(W), np.arange(H), indexing="xy")
u = js.reshape(-1).astype(np.float32)/W
v = 1.0-(is_.reshape(-1)+1.0).astype(np.float32)/H
o, d = generate_camera_ray(cam, u, v)
o = np.asarray(o); d = np.asarray(d)
hit, t, tri, _ = intersect_closest_wavefront(scene, jnp.asarray(o), jnp.asarray(d), jnp.float32(1e4))
hit=np.asarray(hit); t=np.asarray(t); tri=np.asarray(tri)
p = o + t[:,None]*d
sp = np.asarray(scene.tri_positions)
v0,v1,v2 = sp[np.maximum(tri,0),0], sp[np.maximum(tri,0),1], sp[np.maximum(tri,0),2]
gn = np.cross(v1-v0, v2-v0); gn/=np.maximum(np.linalg.norm(gn,axis=1,keepdims=True),1e-12)
rng = np.random.default_rng(5)
noise = rng.random((len(o),2)).astype(np.float32)
wi = np.asarray(sample_cosine_hemisphere(jnp.asarray(noise), jnp.asarray(gn)))
o2 = (p + 1e-3*gn)[hit]; d2 = wi[hit]
n2 = len(o2)
print("bounce rays", n2)

def mt_t(o, d, tris):
    C, L = tris.shape[:2]
    e1 = tris[:,:,1]-tris[:,:,0]; e2 = tris[:,:,2]-tris[:,:,0]
    best = np.full((len(o), C), np.inf, np.float32)
    for c in range(C):
        pv = np.cross(d[:,None,:], e2[c][None])          # (R,L,3)
        det = np.einsum('rlk,lk->rl', pv, e1[c])
        ok = np.abs(det) > 1e-9
        inv = np.where(ok, 1.0/np.where(ok, det, 1.0), 0.0)
        tv = o[:,None,:]-tris[c,:,0][None]               # (R,L,3)
        uu = np.einsum('rlk,rlk->rl', tv, pv)*inv
        qv = np.cross(tv, e1[c][None])
        vv = np.einsum('rlk,rk->rl', qv, d)*inv
        tt = np.einsum('rlk,lk->rl', qv, e2[c])*inv
        good = ok & (uu>=-1e-7) & (vv>=-1e-7) & (uu+vv<=1+1e-7) & (tt>1e-4)
        best[:,c] = np.where(good, tt, np.inf).min(1)
    return best

def sweep_iters(ranges_arr, tag):
    cs = build_clusters(tp, 128, ranges=ranges_arr)
    C = cs.num_clusters
    tcl = mt_t(o2, d2, cs.tris)
    inv = 1.0/d2
    lo = (cs.aabb_min[None]-o2[:,None])*inv[:,None]; hi = (cs.aabb_max[None]-o2[:,None])*inv[:,None]
    t0 = np.minimum(lo,hi).max(2); t1 = np.maximum(lo,hi).min(2)
    TILE = 128
    iters_total = 0; tiles = 0; maxit = 0
    for s in range(0, n2 - n2 % TILE, TILE):
        e0 = t0[s:s+TILE]; e1_ = t1[s:s+TILE]; tc = tcl[s:s+TILE]
        best = np.full(TILE, np.inf, np.float32)
        tested = np.zeros(C, bool)
        it = 0
        while True:
            live = (e0 < best[:,None]) & (e0 <= e1_) & (e1_ > 0) & ~tested[None]
            if not live.any(): break
            entry = np.where(live, e0, np.inf)
            c = int(entry.min(0).argmin())
            tested[c] = True
            best = np.minimum(best, tc[:,c])
            it += 1
        iters_total += it; tiles += 1; maxit = max(maxit, it)
    print(f"{tag}: C={C} mean sweep iters/tile {iters_total/tiles:.2f} max {maxit}")

sweep_iters(treelet_ranges(bvh, 128, tp, sa_alpha=1e30), "unconditional (round-1)")
sweep_iters(treelet_ranges(bvh, 128, tp, sa_alpha=1.0),  "SA-bounded alpha=1 (current)")
sweep_iters(treelet_ranges(bvh, 128, None),               "no merge")
sweep_iters(None if False else np.stack([np.arange(0, len(tp), 128), np.minimum(np.arange(0, len(tp), 128)+128, len(tp))],1).astype(np.int64), "blind chunks")

"""Dump courtyard bench-camera ray populations + true hits to
/tmp/court_rays.npz for offline sweep simulation (prof/sim_ksweep.py).
Same generation flow/seed as prof/diag_iters.py."""
import sys; sys.path.insert(0, "/root/repo")
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np
import jax.numpy as jnp

from rayfinder_tpu.ops.pallas_walk import pallas_intersect_closest
from rayfinder_tpu.render.camera import create_camera, generate_camera_ray
from rayfinder_tpu.render.scene import build_device_scene
from rayfinder_tpu.render.sampling import sample_cosine_hemisphere
from rayfinder_tpu.scene.procedural import courtyard_scene

scale = int(sys.argv[1]) if len(sys.argv) > 1 else 26
W = H = 512
flat, textures = courtyard_scene(scale)
scene = build_device_scene(flat, textures=textures)
camera = create_camera([-16.0, 5.0, 0.0], [12.0, 2.0, 0.0], 0.0, 1.0,
                       70.0, W / H)
js, is_ = np.meshgrid(np.arange(W), np.arange(H), indexing="xy")
u = (js.reshape(-1) + 0.5).astype(np.float32) / W
v = 1.0 - (is_.reshape(-1) + 0.5).astype(np.float32) / H
o, d = generate_camera_ray(camera, jnp.asarray(u), jnp.asarray(v))

rng = np.random.default_rng(7)
sp = np.asarray(scene.tri_positions)
out = {}


def trace(tag, o, d):
    hit, t, tri = pallas_intersect_closest(scene, o, d, jnp.float32(1e4))
    hit, t, tri = np.asarray(hit), np.asarray(t), np.asarray(tri)
    out[f"{tag}_o"], out[f"{tag}_d"] = np.asarray(o), np.asarray(d)
    out[f"{tag}_hit"], out[f"{tag}_t"], out[f"{tag}_tri"] = hit, t, tri
    print(tag, o.shape[0], "hit", hit.mean())
    return hit, t, tri


hit, t, tri = trace("primary", o, d)
on, dn = np.asarray(o), np.asarray(d)
for bounce in (1, 2):
    p = on + t[:, None] * dn
    trin = np.maximum(tri, 0)
    v0, v1, v2 = sp[trin, 0], sp[trin, 1], sp[trin, 2]
    gn = np.cross(v1 - v0, v2 - v0)
    gn /= np.maximum(np.linalg.norm(gn, axis=1, keepdims=True), 1e-12)
    gn = np.where((np.einsum("ij,ij->i", gn, dn) > 0)[:, None], -gn, gn)
    noise = rng.random((len(on), 2)).astype(np.float32)
    wi = np.asarray(sample_cosine_hemisphere(jnp.asarray(noise), jnp.asarray(gn)))
    on = (p + 1e-3 * gn)[hit]
    dn = wi[hit]
    trih = trin[hit]
    order = np.argsort(trih, kind="stable")
    on, dn = on[order], dn[order]
    hit, t, tri = trace(f"bounce{bounce}srt", jnp.asarray(on), jnp.asarray(dn))

out["cluster_min"] = np.asarray(scene.cluster_min)
out["cluster_max"] = np.asarray(scene.cluster_max)
out["cluster_start"] = np.asarray(scene.cluster_start)
np.savez_compressed("/tmp/court_rays.npz", **out)
print("wrote /tmp/court_rays.npz")
